"""Pure-torch stand-ins for the reference's C++/CUDA deps, so the actual
reference network path (/root/reference/models/pointcnn.py, XConv.py) can run
on this machine's CPU torch for parity testing and baseline generation.

Implements the public semantics of torch_geometric.nn.{fps, knn_graph,
knn_interpolate, Reshape} and torch_geometric.data.Data in ~20 lines each
(VERDICT r1 item 3), restores a torch.symeig compatible with the reference's
calls (removed upstream in torch>=2), and stubs open3d/gurobipy/pymeshlab.

Call install() BEFORE importing anything from /root/reference.
"""
from __future__ import annotations

import math
import sys
import types

import torch

_FPS_LOG: list = []          # selection indices recorded by the fps shim
FPS_FORCE_START: int | None = None   # pin every fps start (parity tests)


def fps(pos, batch=None, ratio=0.5, random_start=True):
    """Farthest point sampling, torch_geometric semantics: per batch element
    select ceil(ratio*n) points; greedy max of running min-distance."""
    n = pos.size(0)
    if batch is None:
        batch = torch.zeros(n, dtype=torch.long)
    out = []
    for b in torch.unique(batch):
        idx = (batch == b).nonzero().view(-1)
        p = pos[idx][:, :3]
        m = max(int(math.ceil(ratio * idx.numel())), 1)
        if FPS_FORCE_START is not None:
            start = FPS_FORCE_START
        elif random_start:
            start = int(torch.randint(idx.numel(), (1,)))
        else:
            start = 0
        sel = torch.empty(m, dtype=torch.long)
        sel[0] = start
        d = (p - p[start]).pow(2).sum(1)
        for i in range(1, m):
            c = int(torch.argmax(d))
            sel[i] = c
            d = torch.minimum(d, (p - p[c]).pow(2).sum(1))
        out.append(idx[sel])
        _FPS_LOG.append(sel.clone())
    return torch.cat(out)


def pop_fps_log():
    got, _FPS_LOG[:] = list(_FPS_LOG), []
    return got


def knn(x, y, k, batch_x=None, batch_y=None, num_workers=1):
    """For each y row, indices of its k nearest x rows (ascending distance).
    Returns edge_index (2, len(y)*k) with row = y index, col = x index."""
    d2 = torch.cdist(y, x).pow(2)
    dist, col = torch.topk(d2, k, dim=1, largest=False)
    row = torch.arange(y.size(0)).view(-1, 1).expand_as(col)
    return torch.stack([row.reshape(-1), col.reshape(-1)])


def knn_graph(pos, k, batch=None, loop=False, flow="source_to_target",
              num_workers=1):
    """kNN graph over one cloud. With loop=True the self edge (distance 0)
    is included; neighbors come out in ascending-distance order, grouped by
    center, matching how XConv reshapes the edge list to (N, K)."""
    d2 = torch.cdist(pos, pos).pow(2)
    if not loop:
        d2.fill_diagonal_(float("inf"))
    dist, nbr = torch.topk(d2, k, dim=1, largest=False)
    ctr = torch.arange(pos.size(0)).view(-1, 1).expand_as(nbr)
    if flow == "target_to_source":
        return torch.stack([ctr.reshape(-1), nbr.reshape(-1)])
    return torch.stack([nbr.reshape(-1), ctr.reshape(-1)])


def knn_interpolate(x, pos_x, pos_y, batch_x=None, batch_y=None, k=3,
                    num_workers=1):
    """Inverse-squared-distance interpolation (torch_geometric semantics)."""
    d2 = torch.cdist(pos_y, pos_x).pow(2)
    dist, col = torch.topk(d2, min(k, pos_x.size(0)), dim=1, largest=False)
    w = 1.0 / dist.clamp_min(1e-16)
    num = (x[col] * w.unsqueeze(-1)).sum(1)
    return num / w.sum(1, keepdim=True)


def global_mean_pool(x, batch):
    return x.mean(0, keepdim=True)


class Reshape(torch.nn.Module):
    def __init__(self, *shape):
        super().__init__()
        self.shape = shape

    def forward(self, x):
        return x.view(*self.shape)


class Data:
    """Minimal torch_geometric.data.Data: attribute bag."""

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def _symeig(A, eigenvectors=False, upper=True):
    """The torch.symeig the reference was written against (ascending
    eigenvalues; optional eigenvectors)."""
    if eigenvectors:
        return torch.linalg.eigh(A, UPLO="U" if upper else "L")
    e = torch.linalg.eigvalsh(A, UPLO="U" if upper else "L")
    return e, torch.empty(0)


def install() -> None:
    """Install the shims; idempotent. Must run before reference imports."""
    for name in ["open3d", "open3d.geometry", "open3d.utility", "open3d.io",
                 "open3d.visualization", "gurobipy", "pymeshlab",
                 "matplotlib", "matplotlib.pyplot"]:
        if name.startswith("matplotlib"):
            # stub only when genuinely absent: an empty module here would
            # shadow the REAL matplotlib for the rest of the process (it
            # is a baked-in dependency of vis.plot_* in this environment)
            try:
                __import__(name)
                continue
            except ImportError:
                pass
        sys.modules.setdefault(name, types.ModuleType(name))

    tg = sys.modules.get("torch_geometric")
    if tg is None or not getattr(tg, "_dipole_tpu_shim", False):
        tg = types.ModuleType("torch_geometric")
        tg._dipole_tpu_shim = True
        tg_nn = types.ModuleType("torch_geometric.nn")
        tg_nn.fps = fps
        tg_nn.knn = knn
        tg_nn.knn_graph = knn_graph
        tg_nn.knn_interpolate = knn_interpolate
        tg_nn.global_mean_pool = global_mean_pool
        tg_nn.Reshape = Reshape
        tg_data = types.ModuleType("torch_geometric.data")
        tg_data_data = types.ModuleType("torch_geometric.data.data")
        tg_data_data.Data = Data
        tg_data.Data = Data
        tg_data.data = tg_data_data
        tg.nn = tg_nn
        tg.data = tg_data
        sys.modules["torch_geometric"] = tg
        sys.modules["torch_geometric.nn"] = tg_nn
        sys.modules["torch_geometric.data"] = tg_data
        sys.modules["torch_geometric.data.data"] = tg_data_data

    tc = types.ModuleType("torch_cluster")
    tc.knn_graph = knn_graph
    tc.fps = fps
    sys.modules.setdefault("torch_cluster", tc)

    torch.symeig = _symeig
    torch.Tensor.cuda = lambda self, *a, **k: self

    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
