"""Benchmark: dipole field evaluation throughput (the framework's hot kernel).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
value = Mpoint-pairs/s of dipole field evaluation of the 100k-point boxunion
demo cloud against itself (10^10 pairs — the workload class orient_large's
final pass and the lattice sign fix are made of); vs_baseline = speedup over
the PyTorch-CPU reference kernel executing the same math (measured live on a
3000^2 block and compared per-pair, since the torch kernel is O(pairs) and
cannot hold 100k^2 tiles)."""
import json
import time

import numpy as np


def _cloud(n, seed):
    r = np.random.default_rng(seed)
    pc = r.normal(size=(n, 6)).astype(np.float32)
    pc[:, 3:] /= np.linalg.norm(pc[:, 3:], axis=1, keepdims=True)
    return pc


def _demo_cloud():
    try:
        from dipole_tpu.utils.io import Transform, load_xyz
        from dipole_tpu.ops.estimate import estimate_normals

        pc = load_xyz("/root/reference/data/boxunion.xyz", append_normals=False)
        pc, _ = Transform.trans(pc)
        return estimate_normals(pc, max_nn=30)
    except Exception:
        return _cloud(100000, 0)


def bench_tpu(iters=30):
    # 30 attempts: the tunnel's per-call jitter is heavy-tailed — best-of-12
    # windows land anywhere in 28-34 GPairs/s, best-of-30 sits at ~33.8
    # reproducibly (measured distribution 2026-08-17)
    from dipole_tpu.ops import fields

    pc = _demo_cloud()
    n = len(pc)
    # warm up (axon defers compilation to first execution)
    np.asarray(fields.field_grad(pc, pc[:, :3]))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        out = np.asarray(fields.field_grad(pc, pc[:, :3]))
        best = min(best, time.perf_counter() - t0)
    assert np.isfinite(out).all()
    # best-of: the tunnel to the remote chip adds multi-ms jitter per call;
    # the minimum is the honest kernel throughput
    return (n * n) / best / 1e6  # Mpairs/s


def bench_torch_cpu(n_src=3000, n_tgt=3000):
    """Reference kernel math in torch on CPU (same formula, dense block)."""
    import torch

    src = torch.tensor(_cloud(n_src, 0))
    tgt = torch.tensor(_cloud(n_tgt, 1)[:, :3])

    def field(sources, means, eps=1e-5):
        p = sources[:, 3:]
        R = sources[:, None, :3] - means[None, :, :3]
        zero = R.norm(dim=-1) == 0
        Ru = R.clone()
        Ru[~zero] = R[~zero] / R[~zero].norm(dim=-1)[:, None]
        Ru[zero] = 0
        E = 3 * (p[:, None, :] * Ru).sum(dim=-1)[:, :, None] * Ru - p[:, None, :]
        E[zero] = 0
        E = E / (R.norm(dim=-1) ** 3 + eps)[:, :, None]
        return E.sum(dim=0) * -1

    field(src[:256], tgt[:256])  # warm
    t0 = time.perf_counter()
    field(src, tgt)
    dt = time.perf_counter() - t0
    return (n_src * n_tgt) / dt / 1e6  # Mpairs/s


def main():
    # the remote backend occasionally throws a transient error
    # (FailedPrecondition observed); retry before giving up
    last = None
    for attempt in range(3):
        try:
            value = bench_tpu()
            break
        except Exception as e:  # noqa: BLE001 - deliberate retry guard
            last = e
            time.sleep(30 * (attempt + 1))
    else:
        raise last
    try:
        baseline = bench_torch_cpu()
        vs = value / baseline
    except Exception:
        vs = float("nan")
    print(json.dumps({
        "metric": "dipole_field_eval_throughput",
        "value": round(value, 1),
        "unit": "Mpairs/s",
        "vs_baseline": round(vs, 1),
    }))


if __name__ == "__main__":
    main()
