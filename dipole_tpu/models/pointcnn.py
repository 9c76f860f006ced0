"""PointCNN flip-classifier — functional JAX implementation.

Architecture parity with the reference PointCNN (models/pointcnn.py:11-109)
and XConv (models/XConv.py:20-161), consuming the torch state_dicts loaded
by models/checkpoints.py directly (flat param dict keyed by the torch
names), so the three shipped checkpoints drive this network unchanged.

Model: per-patch input (N, 6) [xyz + unoriented normal] -> per-point 2-class
logits [keep, flip]. Encoder: 4 XConv stages (6->32->64->128->256, kernel
sizes 16/20/20/20) with FPS pooling between stages; decoder: 3 XConv +
inverse-distance kNN upsampling + a final linear to 2 channels. Input is
canonicalized per patch: centered, rotated to PCA axes, xyz scaled by the
largest eigenvalue (reference models/pointcnn.py:36-38, util.py:503-517).

TPU-first design:
  * one jitted forward per (bucket, pool) — patches are padded to
    power-of-two buckets with a validity mask threaded through every stage
    (kNN, FPS, interpolation), so hundreds of ragged patches reuse a handful
    of compiled programs;
  * kNN/FPS/interpolation are the masked on-device kernels from
    ops/neighbors.py — no torch_cluster/torch_geometric C++ ops;
  * the X-transform's grouped Conv1d stacks are expressed as einsums over
    reshaped weights (a grouped conv with kernel == length is a per-group
    linear map), which XLA fuses onto the MXU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dipole_tpu.ops.linalg import eigh3x3

__all__ = ["pointcnn_logits", "PointCNNParams", "KERNEL_SIZES"]

_HI = jax.lax.Precision.HIGHEST
_SENTINEL = 1.0e6

# (K, C_in, C_out) per stage, from the reference architecture
ENCODER = [(16, 6, 32), (20, 32, 64), (20, 64, 128), (20, 128, 256)]
DECODER = [(20, 256, 128), (20, 128, 64), (20, 64, 32)]
KERNEL_SIZES = [s[0] for s in ENCODER + DECODER]


def _linear(p, prefix, x):
    return jnp.dot(x, p[f"{prefix}.weight"].T, precision=_HI) + p[f"{prefix}.bias"]


def _elu(x):
    return jax.nn.elu(x)


def _use_pallas_knn(k: int | None = None, ns: int | None = None) -> bool:
    """Gate for the Pallas kNN/FPS branch. Beyond availability, callers pass
    (k, ns) so degenerate shapes take the scan path instead of erroring
    where the scan degrades gracefully (ADVICE r3): k > ns (tiny pools) and
    sources past the kernel's VMEM budget (the cell holds the full (128, ns)
    f32 distance block + (8, ns) source planes ≈ 544·ns bytes; 8192 keeps it
    under ~4.5 MB with ample headroom — every real bucket is ≤ 2048)."""
    from dipole_tpu.ops import neighbors_pallas

    if k is not None and ns is not None and k > ns:
        return False
    if ns is not None and ns > neighbors_pallas.MAX_KNN_SOURCES:
        return False
    return neighbors_pallas.available()


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _gather_rows(x, idx):
    """x[idx] for integer idx (..., k) over rows of x (N, C).

    On TPU the gather runs as a one-hot matmul on the MXU: measured 8.6 ->
    1.7 ms for a (128, 512, 20, 64) batched gather and BIT-EXACT at HIGHEST
    precision (each output is one x value * 1.0 plus exact zeros; the
    bf16-decomposition passes reconstruct f32 exactly) — XLA fuses the
    one-hot into the matmul, so the (..., N) selection matrix is never
    materialized. Neighbor/pooling gathers dominate the forward's conv
    stages (tools/forward_profile.py), so this is the single largest win
    after the kNN kernel. CPU keeps the native gather (same bits; dense
    one-hot flops are a loss without an MXU). Plain XLA, not Pallas — gated
    on the platform only, so the DIPOLE_TPU_NO_PALLAS kill-switch (a
    Mosaic-issue escape hatch) does not also disable it."""
    if _on_tpu():
        P = jax.nn.one_hot(idx, x.shape[0], dtype=x.dtype)
        return jnp.einsum("...j,jc->...c", P, x, precision=_HI)
    return x[idx]


def _knn_self(pos, k):
    """Self-inclusive kNN among the padded patch (small N: dense).

    On TPU this is the Pallas VMEM kernel (ops/neighbors_pallas.py) —
    bit-identical selections, one HBM pass instead of k. The k-step
    masked-argmin scan below is the CPU/reference path; a stable argsort
    would also compute identical selections but makes the axon remote
    compile pathological (>20 min vs ~35 s; measured, then reverted) — cf.
    the same backend's lax.top_k behavior."""
    if _use_pallas_knn(k, pos.shape[0]):
        from dipole_tpu.ops.neighbors_pallas import knn_with_dist_pallas

        idx, _ = knn_with_dist_pallas(pos, pos, k)
        return idx
    d2 = jnp.sum((pos[None, :, :] - pos[:, None, :]) ** 2, axis=-1)
    rows = jnp.arange(pos.shape[0])

    def step(dd, _):
        j = jnp.argmin(dd, axis=1)
        dd = dd.at[rows, j].set(jnp.inf)
        return dd, j

    _, idx = jax.lax.scan(step, d2, None, length=k)
    return jnp.moveaxis(idx, 0, 1)                       # (N, k)


def _clip_bound(n: int) -> float:
    """Static clamp for pos_diff: covers any valid-valid pair of z-scored
    coords (max |z| = sqrt(n)) with margin, far below the 1e6 sentinel."""
    return max(64.0, 4.0 * float(n) ** 0.5)


def _xconv(p, prefix, x, pos, K, C_in, C_out, idx=None):
    """One XConv stage (reference models/XConv.py:119-157).

    idx: optional precomputed self-kNN of `pos` with >= K columns (its first
    K columns are bit-identical to _knn_self(pos, K): the k-step masked
    argmin scan selects neighbors in distance-rank order, so a longer scan's
    prefix IS the shorter scan). Stages sharing a position set pass one
    shared scan instead of re-searching — before the Pallas kNN kernel the
    scans were ~40% of the forward's device time (tools/forward_profile.py;
    BASELINE.md round-3 section has the full optimization ledger)."""
    N = pos.shape[0]
    idx = _knn_self(pos, K) if idx is None else idx[:, :K]
    pos_diff = _gather_rows(pos, idx) - pos[:, None, :]  # neighbor - center
    # canonicalized patches have diameter O(1); the only way to see a large
    # pos_diff is a pair involving a _SENTINEL padding row (when fewer than
    # K same-kind rows exist). Unclamped, that 1e6 feeds the X-transform and
    # compounds to inf over the 7 stages — NaN gradients via 0 * inf even
    # though padded rows are masked out of the loss. The bound scales with
    # patch size because z-scored coords can reach sqrt(N) (one dominant
    # outlier), so valid-valid pairs stay bit-identical at any bucket size
    # while sentinel pairs (1e6) are still clamped.
    pos_diff = jnp.clip(pos_diff, -_clip_bound(N), _clip_bound(N))

    if x is None:
        h = _elu(_linear(p, f"{prefix}.mlp1.0", pos_diff.reshape(-1, 3)))
        h = _elu(_linear(p, f"{prefix}.mlp1.3", h))
        x_knn = h.reshape(N, K, -1)
    else:
        x_knn = _gather_rows(x, idx)                     # (N, K, C_in)

    # X-transform: Linear(3K -> K^2), two grouped "conv" stages (each a
    # per-group K->K linear), producing the (K, K) transform per point
    T = _elu(_linear(p, f"{prefix}.mlp2.0", pos_diff.reshape(N, K * 3)))
    T = T.reshape(N, K, K)
    w4 = p[f"{prefix}.mlp2.4.weight"].reshape(K, K, K)   # (g, o, t)
    b4 = p[f"{prefix}.mlp2.4.bias"].reshape(K, K)
    T = _elu(jnp.einsum("ngt,got->ngo", T, w4, precision=_HI) + b4)
    w8 = p[f"{prefix}.mlp2.8.weight"].reshape(K, K, K)
    b8 = p[f"{prefix}.mlp2.8.bias"].reshape(K, K)
    T = jnp.einsum("ngt,got->ngo", T, w8, precision=_HI) + b8

    # x_transformed[n, c, k] = sum_j T[n, k, j] * x_knn[n, j, c]
    xt = jnp.einsum("nkj,njc->nck", T, x_knn, precision=_HI)

    # depthwise conv (groups = C_in, kernel = K) + linear out
    dm = -(-C_out // C_in)
    w0 = p[f"{prefix}.conv.0.weight"].reshape(C_in, dm, K)
    b0 = p[f"{prefix}.conv.0.bias"].reshape(C_in, dm)
    out = jnp.einsum("nct,cmt->ncm", xt, w0, precision=_HI) + b0
    out = out.reshape(N, C_in * dm)
    return _linear(p, f"{prefix}.conv.2", out)


def _fps_masked(pos, valid, m, start):
    """FPS over valid points only; padded rows (valid=False) are never
    selected while any real point remains (their running distance is -1).
    Batched forward paths instead run ALL patches' chains lock-step in one
    VMEM kernel (_fps_batch; a vmapped per-patch kernel would serialize
    over the grid)."""
    mind = jnp.where(valid, jnp.sum((pos - pos[start]) ** 2, axis=-1), -1.0)

    def step(i, carry):
        sel, mind = carry
        c = jnp.argmax(mind)
        sel = sel.at[i].set(c)
        d = jnp.sum((pos - pos[c]) ** 2, axis=-1)
        return sel, jnp.minimum(mind, d)

    sel0 = jnp.zeros((m,), jnp.int32).at[0].set(start)
    sel, _ = jax.lax.fori_loop(1, m, step, (sel0, mind))
    return sel


def _random_valid_index(key, valid):
    n_valid = valid.sum()
    k = jnp.minimum((jax.random.uniform(key) * n_valid).astype(jnp.int32),
                    n_valid - 1)
    cs = jnp.cumsum(valid.astype(jnp.int32)) - 1
    return jnp.argmax((cs == k) & valid)


def _interpolate(x, pos_src, pos_dst, k=16):
    """Inverse-squared-distance kNN interpolation (reference
    models/pointcnn.py:95 / torch_geometric semantics). Same TPU/CPU split
    as _knn_self: the Pallas kernel returns the identical (idx, d2) pairs
    the scan would."""
    if _use_pallas_knn(k, pos_src.shape[0]):
        from dipole_tpu.ops.neighbors_pallas import knn_with_dist_pallas

        idx, dist2 = knn_with_dist_pallas(pos_dst, pos_src, k)
    else:
        d2 = jnp.sum((pos_src[None, :, :] - pos_dst[:, None, :]) ** 2, axis=-1)
        rows = jnp.arange(pos_dst.shape[0])

        def step(dd, _):
            j = jnp.argmin(dd, axis=1)
            v = dd[rows, j]
            dd = dd.at[rows, j].set(jnp.inf)
            return dd, (j, v)

        _, (idx, dist2) = jax.lax.scan(step, d2, None, length=k)
        idx = jnp.moveaxis(idx, 0, 1)
        dist2 = jnp.moveaxis(dist2, 0, 1)
    w = 1.0 / jnp.maximum(dist2, 1e-16)
    xk = _gather_rows(x, idx)
    return jnp.sum(xk * w[..., None], axis=1) / jnp.sum(w, axis=1, keepdims=True)


def _canonicalize(pc, valid):
    """Center, PCA-rotate (xyz scaled by sqrt(largest eig), normals rotated
    unscaled) — reference pointcnn.py:36-38, util.py:503-517. Returns the
    (Npad, 6) network input and the (Npad, 3) positions (sentinel rows on
    padding)."""
    w = valid.astype(jnp.float32)
    cnt = jnp.maximum(w.sum(), 1.0)
    xyz = pc[:, :3]
    mean = (xyz * w[:, None]).sum(0) / cnt
    xyz = xyz - mean
    temp = xyz * w[:, None]
    cov = jnp.einsum("ni,nj->ij", temp, temp, precision=_HI) / cnt
    e, V = eigh3x3(cov)
    rot = jnp.dot(xyz, V, precision=_HI) / jnp.sqrt(jnp.maximum(e[2], 1e-20))
    nrm = jnp.dot(pc[:, 3:6], V, precision=_HI)
    pos1 = jnp.where(valid[:, None], rot, _SENTINEL)
    # features of padded rows are zeroed — only their POSITION carries the
    # sentinel (to keep them out of every kNN). Feeding the 1e6 sentinel as
    # a feature lets padded-row activations compound to inf over the 7
    # stages, and the backward's 0-cotangent * inf-primal = NaN then poisons
    # the shared-weight gradients even though the loss masks padded rows.
    x = jnp.where(valid[:, None],
                  jnp.concatenate([rot, nrm], axis=1), 0.0)
    return x, pos1


def _pool_valid(valid, pool, m: int):
    """Validity mask of the next pooling stage: the first ceil(pool * n_valid)
    of the m padded FPS slots are real (the single source of the
    pooled-count rule; batched callers pass (B, N) masks)."""
    counts = jnp.ceil(pool * valid.sum(axis=-1)).astype(jnp.int32)
    return jnp.arange(m) < counts[..., None]


def _forward_core_sels(p, x, pos1, pool, m2: int,
                       sel1, valid2, pos2, sel2):
    """Network composition with the two FPS selections precomputed (sel1 on
    pos1, sel2 on pos2) — batched callers compute them for the whole batch
    in one lock-step kernel (_fps_batch) instead of per-patch loops.

    Each position set is kNN-searched ONCE and the search shared by every
    stage on that set (enc1+dec3 on pos1, enc2+dec2 on pos2,
    enc3/enc4/dec1 on pos3): selections are bit-identical to per-stage
    searches (see _xconv). With the Pallas kNN kernel, MXU gathers and the
    batched FPS, the warm (128, 512) chunk is 83 ms vs the original 259 ms
    (tools/forward_profile.py, BASELINE.md)."""
    # encoder (reference models/pointcnn.py:63-78)
    idx1 = _knn_self(pos1, 20)
    x = jax.nn.relu(_xconv(p, "encoder.conv1", x, pos1, 16, 6, 32, idx=idx1))

    x = _gather_rows(x, sel1)
    idx2 = _knn_self(pos2, 20)
    x = jax.nn.relu(_xconv(p, "encoder.conv2", x, pos2, 20, 32, 64, idx=idx2))

    valid3 = _pool_valid(valid2, pool, m2)
    x = _gather_rows(x, sel2)
    pos3 = jnp.where(valid3[:, None], _gather_rows(pos2, sel2), _SENTINEL)
    idx3 = _knn_self(pos3, 20)
    x = jax.nn.relu(_xconv(p, "encoder.conv3", x, pos3, 20, 64, 128, idx=idx3))
    x = jax.nn.relu(_xconv(p, "encoder.conv4", x, pos3, 20, 128, 256, idx=idx3))

    # decoder (reference models/pointcnn.py:91-109)
    x = jax.nn.relu(_xconv(p, "decoder.conv1", x, pos3, 20, 256, 128, idx=idx3))
    x = _interpolate(x, pos3, pos2)
    x = jax.nn.relu(_xconv(p, "decoder.conv2", x, pos2, 20, 128, 64, idx=idx2))
    x = _interpolate(x, pos2, pos1)
    x = jax.nn.relu(_xconv(p, "decoder.conv3", x, pos1, 20, 64, 32, idx=idx1))
    return _linear(p, "decoder.lin4", x)


def _forward_core(p, x, pos1, valid, pool, m1: int, m2: int, s1, s2):
    """Per-patch composition from FPS start indices (single-patch callers;
    batched callers precompute selections via _fps_batch)."""
    sel1 = _fps_masked(pos1, valid, m1, s1)
    valid2 = _pool_valid(valid, pool, m1)
    pos2 = jnp.where(valid2[:, None], _gather_rows(pos1, sel1), _SENTINEL)
    sel2 = _fps_masked(pos2, valid2, m2, s2)
    return _forward_core_sels(p, x, pos1, pool, m2,
                              sel1, valid2, pos2, sel2)


def _fps_batch(pos, valid, m: int, starts):
    """Batched masked FPS: the Pallas lock-step kernel on TPU, a vmapped
    XLA loop elsewhere — identical decisions (tested both ways)."""
    if _use_pallas_knn():
        from dipole_tpu.ops.neighbors_pallas import fps_masked_batch_pallas

        return fps_masked_batch_pallas(pos, valid, m, starts)
    return jax.vmap(lambda pp, vv, ss: _fps_masked(pp, vv, m, ss))(
        pos, valid, starts)


def _batched_sels(pos1, valid, pool, m1: int, m2: int, s1, s2):
    """Batched two-stage FPS geometry: (sel1, valid2, pos2, sel2) for the
    whole batch, each stage one lock-step kernel call."""
    sel1 = _fps_batch(pos1, valid, m1, s1)
    valid2 = _pool_valid(valid, pool, m1)
    pos2 = jnp.where(valid2[..., None],
                     jax.vmap(_gather_rows)(pos1, sel1), _SENTINEL)
    sel2 = _fps_batch(pos2, valid2, m2, s2)
    return sel1, valid2, pos2, sel2


@partial(jax.jit, static_argnames=("m1", "m2"))
def _forward(p, pc, valid, key, pool, m1: int, m2: int):
    """Padded forward: pc (Npad, 6), valid (Npad,) -> logits (Npad, 2).

    m1/m2 are the *padded* FPS sizes (static, per bucket); the number of
    genuinely selected points is ceil(pool * n_valid), tracked via validity
    masks so padded rows never influence real outputs."""
    x, pos1 = _canonicalize(pc, valid)
    k1, k2 = jax.random.split(key)
    s1 = _random_valid_index(k1, valid)
    valid2 = _pool_valid(valid, pool, m1)
    s2 = _random_valid_index(k2, valid2)
    return _forward_core(p, x, pos1, valid, pool, m1, m2, s1, s2)


@partial(jax.jit, static_argnames=("m1", "m2"))
def _forward_starts(p, pc, valid, s1, s2, pool, m1: int, m2: int):
    """Padded forward with explicit FPS start indices (s1 within the valid
    prefix, s2 within the stage-1 valid prefix). Used by the torch-compatible
    RNG replay: starts drawn host-side from utils.torch_rng reproduce the
    reference's randint stream exactly."""
    x, pos1 = _canonicalize(pc, valid)
    return _forward_core(p, x, pos1, valid, pool, m1, m2, s1, s2)


@partial(jax.jit, static_argnames=("m1", "m2"))
def _forward_pinned(p, x, pos1, pool, m1: int, m2: int, s1, s2):
    """Parity/testing entry: unpadded canonicalized input with pinned FPS
    starts — makes the composition bit-for-bit comparable against the torch
    reference run under tools/torch_shims with the same starts."""
    valid = jnp.ones((x.shape[0],), bool)
    return _forward_core(p, x, pos1, valid, pool, m1, m2, s1, s2)


class PointCNNParams:
    """A loaded checkpoint + pool ratio, callable on ragged patches.

    Pads each patch to a power-of-two bucket so all patches share a handful
    of compiled programs (replaces reference inference_utils.load_model_from_file
    :38-44)."""

    def __init__(self, params: dict, pool: float):
        self.params = {k: jnp.asarray(v) for k, v in params.items()}
        self.pool = float(pool)
        self._digest = None

    @property
    def content_digest(self) -> int:
        """Stable 31-bit digest of the weights. Ensemble voting folds this
        (not the model-list index) into per-model PRNG keys, so results are
        invariant to --models ordering."""
        if self._digest is None:
            import hashlib

            h = hashlib.sha256()
            for k in sorted(self.params):
                h.update(k.encode())
                h.update(np.asarray(self.params[k], np.float32).tobytes())
            h.update(np.float32(self.pool).tobytes())
            self._digest = int.from_bytes(h.digest()[:4], "little") & 0x7FFFFFFF
        return self._digest

    @staticmethod
    def from_files(pt_path, txt_path=None):
        from dipole_tpu.models.checkpoints import load_state_dict, load_model_opts
        from pathlib import Path

        pt_path = Path(pt_path)
        txt_path = txt_path or pt_path.with_suffix(".txt")
        return PointCNNParams(load_state_dict(pt_path),
                              load_model_opts(txt_path)["pool"])

    def logits(self, patch, key=None) -> np.ndarray:
        """Per-point 2-class logits for an (n, 6) patch."""
        return pointcnn_logits(self.params, self.pool, patch, key)


def _bucket(n: int, base: int = 128) -> int:
    b = base
    while b < n:
        b *= 2
    return b


def derive_keys_cpu(fn):
    """Run a PRNG-key derivation on the host CPU backend and return numpy.

    threefry is platform-deterministic (bit-identical keys; asserted in
    tests), but each fold_in/split dispatched to the remote TPU costs a
    ~30 ms tunnel round vs ~3 ms on the local CPU backend (measured) — and
    the ensemble loop derives a handful of keys per model pass. fn receives
    a `put` helper that moves a key onto the CPU device. Configurations
    without a CPU backend (e.g. JAX_PLATFORMS=tpu) fall back to the default
    backend — same bits, just the slower dispatch."""
    try:
        cpu = jax.local_devices(backend="cpu")[0]
    except Exception:
        return np.asarray(fn(lambda k: k))
    with jax.default_device(cpu):
        return np.asarray(fn(lambda k: jax.device_put(np.asarray(k), cpu)))


def _batched_core(p, x, pos1, valid, pool, m1: int, m2: int, s1, s2):
    """Batched composition from canonicalized inputs + per-patch FPS start
    indices: both FPS stages run lock-step for the whole batch (_fps_batch),
    then the conv composition is vmapped with selections precomputed."""
    sel1, valid2, pos2, sel2 = _batched_sels(pos1, valid, pool, m1, m2, s1, s2)
    return jax.vmap(
        lambda xx, p1, a, v2, p2, b: _forward_core_sels(
            p, xx, p1, pool, m2, a, v2, p2, b)
    )(x, pos1, sel1, valid2, pos2, sel2)


def _forward_batched_impl(p, pc, valid, keys, pool, m1: int, m2: int):
    x, pos1 = jax.vmap(_canonicalize)(pc, valid)
    ks = jax.vmap(jax.random.split)(keys)                 # (B, 2, key)
    s1 = jax.vmap(_random_valid_index)(ks[:, 0], valid)
    valid2 = _pool_valid(valid, pool, m1)
    s2 = jax.vmap(_random_valid_index)(ks[:, 1], valid2)
    return _batched_core(p, x, pos1, valid, pool, m1, m2, s1, s2)


_forward_batched = partial(jax.jit, static_argnames=("m1", "m2"))(
    _forward_batched_impl)


@partial(jax.jit, static_argnames=("m1", "m2"))
def _forward_batched_starts(p, pc, valid, s1, s2, pool, m1: int, m2: int):
    x, pos1 = jax.vmap(_canonicalize)(pc, valid)
    return _batched_core(p, x, pos1, valid, pool, m1, m2, s1, s2)


@partial(jax.jit, static_argnames=("m1", "m2"))
def _forward_batched_precanon(p, x, pos, valid, s1, s2, pool, m1: int, m2: int):
    """Batched forward on ALREADY-canonicalized inputs (the torch-exact
    replay path: canonicalization happens host-side with the reference's
    own LAPACK convention, see inference._canon_reference)."""
    return _batched_core(p, x, pos, valid, pool, m1, m2, s1, s2)


# Widest vmapped batch per compiled program. Wider batches amortize dispatch
# better but the program size grows linearly with the batch width — with the
# ORIGINAL scan-based forward, 256-wide x 1024-point buckets crashed the
# backend's remote compiler (HTTP 500, vase demo) and pool-0.99 programs
# took 500s+, which set the old 65536-element budget. The round-3 forward
# (Pallas kNN, MXU gathers, batched FPS) compiles in 9-20s at DOUBLE the
# widths and is 10-18% faster per patch there (measured 2026-08-18, v5e:
# b512 p0.6 256w 0.674 vs 128w 0.784 ms/patch; b512 p0.99 128w 1.109 vs
# 64w 1.353; b1024 p0.6 128w 1.504 vs 64w 1.668; b1024 p0.99 64w 2.701 vs
# 32w 3.112; b2048 p0.6 64w 4.005 vs 32w 4.335). 512-wide adds only 4%
# more at b512 for 2x the program — capped at 256. High pool ratios still
# halve the budget (near-identity pooling doubles stage sizes).
MAX_FORWARD_ELEMS = 131072
MAX_FORWARD_BATCH = 256  # cap; effective width = min(this, budget // bucket)
POOL_WIDE = 0.8


def _forward_width(bucket: int, pool: float = 0.6) -> int:
    elems = MAX_FORWARD_ELEMS // 2 if pool > POOL_WIDE else MAX_FORWARD_ELEMS
    return max(8, min(MAX_FORWARD_BATCH, elems // bucket))


_SHARDED_FORWARD_CACHE: dict = {}


def _forward_batched_sharded(mesh, m1: int, m2: int):
    """shard_map'd batched forward: the vmap (patch) axis is sharded over the
    mesh — patches are independent, so each chip runs its local slice of the
    batch with zero collectives. Per-patch math is identical to the
    single-device _forward (the ensemble stage of orient_pointcloud /
    orient_large, the lion demo's dominant warm stage, scales D-ways)."""
    from jax.sharding import PartitionSpec as P

    cache_key = (id(mesh), m1, m2)
    fn = _SHARDED_FORWARD_CACHE.get(cache_key)
    if fn is not None:
        return fn
    axis = mesh.axis_names[0]

    @partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
    )
    def run(p, pc, valid, keys, pool):
        return _forward_batched_impl(p, pc, valid, keys, pool, m1, m2)

    fn = jax.jit(run)
    _SHARDED_FORWARD_CACHE[cache_key] = fn
    return fn


_SHARDED_STARTS_CACHE: dict = {}


def _forward_batched_starts_sharded(mesh, m1: int, m2: int):
    """shard_map'd explicit-starts forward (deterministic FPS starts under a
    mesh): the batch axis is sharded like _forward_batched_sharded, with the
    per-patch start indices sharded alongside. Per-patch math is identical to
    _forward_batched_starts."""
    from jax.sharding import PartitionSpec as P

    cache_key = (id(mesh), m1, m2)
    fn = _SHARDED_STARTS_CACHE.get(cache_key)
    if fn is not None:
        return fn
    axis = mesh.axis_names[0]

    @partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(), P(axis), P(axis), P(axis), P(axis), P()),
        out_specs=P(axis),
    )
    def run(p, pc, valid, s1, s2, pool):
        x, pos1 = jax.vmap(_canonicalize)(pc, valid)
        return _batched_core(p, x, pos1, valid, pool, m1, m2, s1, s2)

    fn = jax.jit(run)
    _SHARDED_STARTS_CACHE[cache_key] = fn
    return fn


def centroid_starts(patches) -> np.ndarray:
    """Deterministic geometry-derived FPS starts (no RNG): stage 1 starts at
    the patch point nearest the patch centroid — invariant under the
    canonicalization (a rotation + uniform scale about that same centroid),
    under point order (ties broken by lowest index are the only order
    sensitivity, and exact coordinate ties at the argmin are measure-zero),
    and under --models order. Stage 2 starts at pooled index 0, which IS the
    stage-1 start (FPS emits its start first), so both stages anchor on the
    same central point. Replaces the reference's torch.randint draws
    (reference models/pointcnn.py:68,73) whose start noise swings hard
    shapes by whole percents (BASELINE.md hand band)."""
    st = np.zeros((len(patches), 2), np.int32)
    for i, p in enumerate(patches):
        xyz = np.asarray(p, np.float32)[:, :3]
        d = xyz - xyz.mean(axis=0)
        st[i, 0] = int(np.argmin(np.einsum("ij,ij->i", d, d)))
    return st


def prepare_patch_batches(patches, bucket: int, width: int, n_dev: int = 1):
    """Pad patches into device-resident (pc, valid) chunk buffers ONCE.

    The ensemble loop runs the same patch list through every model; without
    this, each model pass re-pads and re-uploads identical buffers (host
    cost + transfer paid len(models) x per iteration). Buffers depend only
    on (patches, bucket, width, n_dev), so models sharing a chunk width
    share one prepared list. Returns [(pc_dev, valid_dev, lo, lens), ...]."""
    prepared = []
    for lo in range(0, len(patches), width):
        chunk = patches[lo:lo + width]
        Bp = _bucket(len(chunk), base=8)
        if n_dev > 1:
            Bp = -(-Bp // n_dev) * n_dev  # whole rows per device
        pc = np.zeros((Bp, bucket, 6), np.float32)
        valid = np.zeros((Bp, bucket), bool)
        for i, p in enumerate(chunk):
            pc[i, : len(p)] = p
            valid[i, : len(p)] = True
        prepared.append((jnp.asarray(pc), jnp.asarray(valid), lo,
                         [len(p) for p in chunk]))
    return prepared


def pointcnn_logits_batched(params, pool: float, patches, key=None,
                            bucket=None, mesh=None, starts=None,
                            precanon: bool = False, prepared=None) -> list:
    """Run the forward over many ragged patches with few compiled programs:
    patches are padded to a shared power-of-two bucket and vmapped in chunks
    of at most MAX_FORWARD_BATCH (each chunk width a power of two, so chunks
    reuse the same compiled program). Returns a list of (n_i, 2) arrays.

    mesh: optional jax.sharding.Mesh — the batch axis is sharded over its
    first axis (chunk width scales by the device count; per-patch results
    are unchanged, patches being independent).

    starts: optional (len(patches), 2) int array of explicit FPS start
    indices per patch (stage-1 index within the patch, stage-2 index within
    the pooled prefix) — the torch-compatible RNG replay path; overrides
    key-derived starts.

    precanon: patches are already canonicalized (requires starts) — the
    in-jit canonicalization is skipped and padded rows get zero features /
    sentinel positions directly.

    prepared: optional result of prepare_patch_batches(patches, bucket,
    width, n_dev) for this call's exact bucket/width — skips the per-call
    pad + upload (the ensemble loop shares one prepared list across all
    models of the same chunk width). Ignored on the precanon replay path
    (whose buffers carry the host-side canonicalization)."""
    patches = [np.asarray(p, np.float32) for p in patches]
    if not patches:
        return []
    nb = bucket or _bucket(max(len(p) for p in patches))
    if key is None:
        key = jax.random.PRNGKey(0)
    m1 = int(-(-nb * pool // 1))
    m2 = int(-(-m1 * pool // 1))

    # the precanon replay path has no sharded program — keep its chunk
    # width single-device (a mesh passed alongside it is ignored rather
    # than inflating the un-sharded program n_dev-fold past the compile
    # budget); the plain explicit-starts path (deterministic FPS starts)
    # shards over the mesh exactly like the key-derived path
    n_dev = int(mesh.devices.size) if mesh is not None and not precanon else 1
    width = _forward_width(nb, pool) * n_dev
    results: list = [None] * len(patches)

    def _check_prepared(prep):
        covered = sum(len(lens) for *_, lens in prep)
        if covered != len(patches):
            raise ValueError(
                f"prepared batches cover {covered} patches, call has "
                f"{len(patches)} (bucket/width mismatch?)")
        for pc_d, *_ in prep:
            if int(pc_d.shape[1]) != nb:
                raise ValueError(
                    f"prepared buffers were padded to bucket "
                    f"{int(pc_d.shape[1])} but this call uses bucket {nb} "
                    f"— stale prepared cache")

    if starts is not None:
        starts = np.asarray(starts, np.int32)
        if precanon or prepared is None:
            batches = prepare_patch_batches(patches, nb, width, n_dev)
        else:
            batches = prepared
            _check_prepared(batches)
        for pc_d, valid_d, lo, lens in batches:
            Bp = int(pc_d.shape[0])
            st = np.zeros((Bp, 2), np.int32)
            st[: len(lens)] = starts[lo:lo + len(lens)]
            if precanon:
                pos = np.full((Bp, nb, 3), _SENTINEL, np.float32)
                for i, p in enumerate(patches[lo:lo + len(lens)]):
                    pos[i, : len(p)] = p[:, :3]
                out = np.asarray(
                    _forward_batched_precanon(
                        params, pc_d, jnp.asarray(pos),
                        valid_d, jnp.asarray(st[:, 0]),
                        jnp.asarray(st[:, 1]), jnp.float32(pool), m1, m2)
                )
            elif mesh is not None:
                fwd = _forward_batched_starts_sharded(mesh, m1, m2)
                out = np.asarray(
                    fwd(params, pc_d, valid_d, jnp.asarray(st[:, 0]),
                        jnp.asarray(st[:, 1]), jnp.float32(pool)))
            else:
                out = np.asarray(
                    _forward_batched_starts(params, pc_d, valid_d,
                                            jnp.asarray(st[:, 0]),
                                            jnp.asarray(st[:, 1]),
                                            jnp.float32(pool), m1, m2)
                )
            for i, n in enumerate(lens):
                results[lo + i] = out[i, :n]
        return results

    keys = derive_keys_cpu(
        lambda put: jax.random.split(put(key), len(patches)))
    if prepared is None:
        prepared = prepare_patch_batches(patches, nb, width, n_dev)
    else:
        _check_prepared(prepared)
    for pc_d, valid_d, lo, lens in prepared:
        Bp = pc_d.shape[0]
        ck = np.concatenate(
            [keys[lo:lo + len(lens)],
             np.tile(keys[lo:lo + 1], (Bp - len(lens), 1))], axis=0)
        if mesh is not None:
            fwd = _forward_batched_sharded(mesh, m1, m2)
            out = np.asarray(fwd(params, pc_d, valid_d, ck, jnp.float32(pool)))
        else:
            out = np.asarray(
                _forward_batched(params, pc_d, valid_d, ck,
                                 jnp.float32(pool), m1, m2)
            )
        for i, n in enumerate(lens):
            results[lo + i] = out[i, :n]
    return results


def pointcnn_logits(params, pool: float, patch, key=None, bucket=None) -> np.ndarray:
    patch = np.asarray(patch, dtype=np.float32)
    n = patch.shape[0]
    nb = bucket if bucket is not None else _bucket(n)
    pad = np.zeros((nb - n, 6), np.float32)
    pc = jnp.asarray(np.concatenate([patch, pad], axis=0))
    valid = jnp.zeros((nb,), bool).at[:n].set(True)
    m1 = int(-(-nb * pool // 1))
    m2 = int(-(-m1 * pool // 1))
    if key is None:
        key = jax.random.PRNGKey(0)
    out = _forward(params, pc, valid, key, jnp.float32(pool), m1, m2)
    return np.asarray(out)[:n]
