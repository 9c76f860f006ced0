"""Pallas TPU kernel for dense masked kNN (the PointCNN forward's search core).

The forward's k-step argmin scan (models/pointcnn._knn_self /_interpolate)
re-reads its (N, N) distance matrix from HBM on every one of the k
sequential steps — ~93 ms of a 227 ms (128, 512)-patch forward chunk
(tools/forward_profile.py). Here the distance block lives in VMEM: one
grid cell owns a TQ-row query block, computes its (TQ, Ns) distances once,
and runs the same k-step masked-min selection entirely on-chip. HBM traffic
drops from k full matrix passes to one read of the positions.

Selection semantics are bit-identical to the scan on TPU hardware
(verified on the v5e, including sentinel tie rows): distances are the same
x²+y²+z² expression, each step picks the global min with ties broken to the
lowest source index (jnp.argmin's rule), and the chosen lane is masked to
+inf. Sentinel-padded rows (position = 1e6) behave exactly as in the dense
scan; wrapper padding columns sit at indices >= Ns at strictly-farther
coordinates (_PAD = 3e6), so they rank after every real column for every
query and out-of-range indices cannot escape (k <= Ns is enforced; without
the offset, a query that exhausted the caller's own sentinel rows would
tie with identical-coordinate padding at d2 = 0 and select it where the
scan selects far real points). Caveat: under CPU
interpret mode LLVM FMA-contracts the mul+add chain, moving d² by 1 ULP,
which can swap sub-f32-resolution ties (tests assert tie-equivalence
there and bit-equality on TPU).

Used by models/pointcnn on TPU; the scan remains the CPU/reference path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["knn_with_dist_pallas", "available", "MAX_KNN_SOURCES"]

# Source-size ceiling for the kNN kernel: one grid cell keeps the full
# (TQ=128, ns) f32 distance block plus the (8, ns) source planes in VMEM
# (~544·ns bytes), so very large sources would blow the ~16 MB budget and
# fail Mosaic compilation where the scan path still works. Callers
# (pointcnn._use_pallas_knn) fall back to the scan above this. 8192 keeps
# the cell under ~4.5 MB; every real forward bucket is <= 2048.
MAX_KNN_SOURCES = 8192

_SENTINEL = 1.0e6
# Wrapper padding columns get coordinates strictly beyond the caller's own
# 1e6 sentinel rows. At 1e6 a padding column would be EXACTLY coincident
# with sentinel rows (d2 = 0 ties), so once a query exhausted the real
# sentinel rows it would select out-of-range padding indices where the
# dense scan selects far real points. At 3e6 a padding column is strictly
# farther from every possible query (sentinel or valid) than any real
# column, so padding is selected only when k exceeds the total column
# count — which the wrapper guards against. Real-row distances are
# untouched, preserving bit-identical selections vs the scan.
_PAD = 3.0e6
_IMAX = 2**31 - 1
_TQ = 128          # query rows per grid cell
_KP = 32           # lane-padded k (selection count k <= _KP)


def available() -> bool:
    """TPU with Pallas enabled (honors the DIPOLE_TPU_NO_PALLAS kill-switch
    that gates every other Pallas kernel; the kernel uses pallas.tpu
    primitives, so non-TPU accelerators take the scan path)."""
    import os

    if os.environ.get("DIPOLE_TPU_NO_PALLAS"):
        return False
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def _knn_kernel(d_ref, s_ref, oi_ref, od_ref, *, k: int):
    """d_ref (8, TQ) query planes [x,y,z,0..]; s_ref (8, Ns) source planes;
    oi_ref (TQ, KP) int32 selected indices; od_ref (TQ, KP) f32 their d²."""
    q = jnp.transpose(d_ref[:])                      # (TQ, 8)
    qx, qy, qz = q[:, 0:1], q[:, 1:2], q[:, 2:3]
    sx, sy, sz = s_ref[0:1, :], s_ref[1:2, :], s_ref[2:3, :]
    dx = qx - sx
    dy = qy - sy
    dz = qz - sz
    d2 = dx * dx + dy * dy + dz * dz                 # (TQ, Ns) in VMEM
    lanes = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    klanes = jax.lax.broadcasted_iota(jnp.int32, (d2.shape[0], _KP), 1)

    def step(i, carry):
        d2c, idx_acc, d2_acc = carry
        m = jnp.min(d2c, axis=1, keepdims=True)
        j = jnp.min(jnp.where(d2c == m, lanes, _IMAX), axis=1, keepdims=True)
        idx_acc = jnp.where(klanes == i, j, idx_acc)
        d2_acc = jnp.where(klanes == i, m, d2_acc)
        d2c = jnp.where(lanes == j, jnp.inf, d2c)
        return d2c, idx_acc, d2_acc

    _, idx_acc, d2_acc = jax.lax.fori_loop(
        0, k, step,
        (d2, jnp.zeros((d2.shape[0], _KP), jnp.int32),
         jnp.zeros((d2.shape[0], _KP), jnp.float32)))
    oi_ref[:] = idx_acc
    od_ref[:] = d2_acc


def _planes(pos, n_pad: int):
    """(N, 3) -> (8, n_pad) channel planes, padding columns at _PAD (strictly
    farther than any real column from any query — see _PAD)."""
    n = pos.shape[0]
    p = jnp.full((8, n_pad), _PAD, jnp.float32)
    return jax.lax.dynamic_update_slice(
        p, jnp.transpose(pos).astype(jnp.float32), (0, 0))


@partial(jax.jit, static_argnames=("k", "interpret"))
def knn_with_dist_pallas(dst, src, k: int, interpret: bool = False):
    """(idx, d2) of the k nearest src points per dst point — bit-identical
    selections to the k-step argmin scan. dst (Nd, 3), src (Ns, 3);
    returns idx (Nd, k) int32, d2 (Nd, k) f32. Positions are treated as
    non-differentiable (they never carry parameter gradients in this
    framework; stop_gradient keeps jax from requiring a kernel transpose)."""
    if not 0 < k <= _KP:
        raise ValueError(f"k must be in (0, {_KP}]: {k}")
    dst = jax.lax.stop_gradient(dst)
    src = jax.lax.stop_gradient(src)
    nd, ns = dst.shape[0], src.shape[0]
    if k > ns:
        raise ValueError(f"k={k} exceeds the {ns} source points")
    ndp = -(-nd // _TQ) * _TQ
    nsp = -(-ns // 128) * 128
    dplanes = _planes(dst, ndp)
    splanes = _planes(src, nsp)
    idx, d2 = pl.pallas_call(
        partial(_knn_kernel, k=k),
        grid=(ndp // _TQ,),
        in_specs=[
            pl.BlockSpec((8, _TQ), lambda i: (0, i)),
            pl.BlockSpec((8, nsp), lambda i: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((_TQ, _KP), lambda i: (i, 0)),
            pl.BlockSpec((_TQ, _KP), lambda i: (i, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((ndp, _KP), jnp.int32),
            jax.ShapeDtypeStruct((ndp, _KP), jnp.float32),
        ),
        interpret=interpret,
    )(dplanes, splanes)
    return idx[:nd, :k], d2[:nd, :k]


# ---------------------------------------------------------------------------
# Masked farthest-point sampling (batched, lock-step)
# ---------------------------------------------------------------------------

def _fps_batch_kernel(x_ref, y_ref, z_ref, v_ref, sh_ref, o_ref, *, m: int):
    """Lock-step FPS for a whole patch batch in ONE kernel instance.

    x/y/z_ref (B, N) coordinate planes; v_ref (B, N) validity (1.0/0.0);
    sh_ref (B, N) one-hot of each row's start point; o_ref (B, Mo) int32 —
    column i holds step i's selection per row. All B sequential chains
    advance together, so each of the m steps is a full-width (B, N) VPU op
    instead of B separate tiny chains (a vmapped per-patch kernel serializes
    over the grid: measured 42 ms vs 39 ms XLA at (128, 512); this form
    runs the same work in ~3 ms). Decision semantics match
    models/pointcnn._fps_masked exactly: first-index argmax ties, running
    min-distance, invalid rows parked at -1."""
    x = x_ref[:]
    y = y_ref[:]
    z = z_ref[:]
    lanes = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    olanes = jax.lax.broadcasted_iota(jnp.int32, o_ref.shape, 1)

    def coords(hit):
        cx = jnp.sum(jnp.where(hit, x, 0.0), axis=1, keepdims=True)
        cy = jnp.sum(jnp.where(hit, y, 0.0), axis=1, keepdims=True)
        cz = jnp.sum(jnp.where(hit, z, 0.0), axis=1, keepdims=True)
        return cx, cy, cz

    def dist(cx, cy, cz):
        return (x - cx) * (x - cx) + (y - cy) * (y - cy) + (z - cz) * (z - cz)

    hit0 = sh_ref[:] > 0.5
    s = jnp.min(jnp.where(hit0, lanes, _IMAX), axis=1, keepdims=True)
    mind = jnp.where(v_ref[:] > 0.5, dist(*coords(hit0)), -1.0)
    sel = jnp.where(olanes == 0, s, jnp.zeros(o_ref.shape, jnp.int32))

    def step(i, carry):
        sel, mind = carry
        mx = jnp.max(mind, axis=1, keepdims=True)
        c = jnp.min(jnp.where(mind == mx, lanes, _IMAX), axis=1, keepdims=True)
        sel = jnp.where(olanes == i, c, sel)
        hit = lanes == c
        mind = jnp.minimum(mind, dist(*coords(hit)))
        return sel, mind

    sel, _ = jax.lax.fori_loop(1, m, step, (sel, mind))
    o_ref[:] = sel


@partial(jax.jit, static_argnames=("m",))
def fps_masked_batch_pallas(pos, valid, m: int, starts):
    """Batched masked FPS — decisions identical to vmapping the XLA
    fori_loop version (models/pointcnn._fps_masked) over the batch.
    pos (B, N, 3), valid (B, N) bool, starts (B,) int. Returns (B, m) int32.
    The N axis is padded to a lane multiple with invalid columns (never
    selected while a real point remains, exactly like bucket padding)."""
    pos = jax.lax.stop_gradient(pos)
    b, n = pos.shape[0], pos.shape[1]
    npad = -(-n // 128) * 128
    bpad = -(-b // 8) * 8
    x = jnp.zeros((bpad, npad), jnp.float32)
    planes = [
        jax.lax.dynamic_update_slice(x, pos[:, :, ch], (0, 0))
        for ch in range(3)
    ]
    v = jax.lax.dynamic_update_slice(
        jnp.zeros((bpad, npad), jnp.float32),
        valid.astype(jnp.float32), (0, 0))
    sh = jax.lax.dynamic_update_slice(
        jnp.zeros((bpad, npad), jnp.float32),
        jax.nn.one_hot(starts, n, dtype=jnp.float32), (0, 0))
    mo = -(-m // 128) * 128
    sel = pl.pallas_call(
        partial(_fps_batch_kernel, m=m),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bpad, mo), jnp.int32),
    )(planes[0], planes[1], planes[2], v, sh)
    return sel[:b, :m]
