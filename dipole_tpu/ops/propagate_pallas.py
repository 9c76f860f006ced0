"""The strongest-field greedy propagation as a single Pallas TPU kernel.

The XLA scan in ops/propagate.py pays per-step while-loop overhead (~165 us
at 131k points — 21 s for a 100k cloud). Here the whole sequential loop runs
inside one kernel: the cloud lives in VMEM as six (8, M) channel planes
(point i at row i//M, col i%M), the accumulator/sign/visited state are loop
values, and each step is pure VPU work — masked argmax over (8, M), masked-
reduction reads of the chosen point's channels (Mosaic has no dynamic_slice
on values), and a fused field-column update. Decision semantics are
identical to ops/propagate (ties resolve to the lowest point index).

Capacity: cloud+state is ~9 (8, M) f32 planes = 36 * N bytes, so ~300k
points fit VMEM; beyond that the dispatch layer falls back to the XLA scan.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["greedy_sign_sequence_pallas", "MAX_PALLAS_GREEDY"]

_SENTINEL = 1.0e6
# Bounded by the same VMEM panel budget as fields_pallas.MAX_PALLAS_SOURCES
# (measured there: panel layouts degrade past ~327k and fail at 524k); the
# greedy kernel carries an extra live (1, N) accumulator + visited row, so
# it keeps the more conservative bound.
MAX_PALLAS_GREEDY = 262144
_NEG = -3.0e38
_IMAX = np.int32(2**31 - 1)


def _greedy_kernel(pts_ref, scal_ref, acc_ref, sign_ref):
    """pts_ref (48, M): six channel planes [x, y, z, px, py, pz], 8 sublanes
    each. scal_ref (1, 2) SMEM: [start, eps]. Outputs acc, sign (8, M)."""
    M = pts_ref.shape[1]
    x = pts_ref[0:8, :]
    y = pts_ref[8:16, :]
    z = pts_ref[16:24, :]
    px = pts_ref[24:32, :]
    py = pts_ref[32:40, :]
    pz = pts_ref[40:48, :]
    eps = scal_ref[0, 1]
    start = scal_ref[0, 0].astype(jnp.int32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (8, M), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, M), 1)
    flat = rows * M + cols

    def column(hit):
        """Interaction of the hit-marked source point at every point."""
        pick = lambda plane: jnp.sum(jnp.where(hit, plane, 0.0))
        sx, sy, sz = pick(x), pick(y), pick(z)
        spx, spy, spz = pick(px), pick(py), pick(pz)
        Rx = sx - x
        Ry = sy - y
        Rz = sz - z
        r2 = Rx * Rx + Ry * Ry + Rz * Rz
        zero = r2 == 0.0
        rr = jnp.sqrt(r2)
        denom = rr * r2 + eps
        cdot = spx * Rx + spy * Ry + spz * Rz
        Rn = px * Rx + py * Ry + pz * Rz
        pn = spx * px + spy * py + spz * pz
        safe_r2 = jnp.where(zero, 1.0, r2)
        t = 1.0 / (safe_r2 * denom)              # single divide per pair
        col = -t * (3.0 * cdot * Rn - pn * safe_r2)
        col = jnp.where(zero, 0.0, col)
        return jnp.where(jnp.isfinite(col), col, 0.0)

    # validity: sentinel-positioned padding starts visited
    hit0 = flat == start
    visited0 = jnp.where(x >= _SENTINEL, 1.0, 0.0)
    visited0 = jnp.where(hit0, 1.0, visited0)
    sign0 = jnp.where(hit0, 1.0, 0.0)
    acc0 = column(hit0)

    def step(_, carry):
        acc, sign, visited = carry
        masked = jnp.where(visited > 0, _NEG, jnp.abs(acc))
        m = jnp.max(masked)
        cand = jnp.where(masked == m, flat, _IMAX)
        c = jnp.min(cand)
        live = m > _NEG / 2
        hit = flat == c
        acc_c = jnp.sum(jnp.where(hit, acc, 0.0))
        s = jnp.where(acc_c < 0, -1.0, 1.0)
        upd = jnp.where(live, s, 0.0)
        sign = jnp.where(hit & live, s, sign)
        visited = jnp.where(hit, 1.0, visited)
        acc = acc + upd * column(hit)
        return acc, sign, visited

    acc, sign, _ = jax.lax.fori_loop(0, M * 8 - 1, step, (acc0, sign0, visited0))
    acc_ref[:] = acc
    sign_ref[:] = sign


@partial(jax.jit, static_argnames=())
def _greedy_pallas_padded(pts48: jnp.ndarray, scal: jnp.ndarray):
    M = pts48.shape[1]
    return pl.pallas_call(
        _greedy_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, M), jnp.float32),
            jax.ShapeDtypeStruct((8, M), jnp.float32),
        ),
    )(pts48, scal)


def _bucket(n: int, base: int = 1024) -> int:
    b = base
    while b < n:
        b *= 2
    return b


def greedy_sign_sequence_pallas(pts, starting_point: int = 0, eps: float = 1e-6):
    """(acc, sign) with the same decisions as propagate.greedy_sign_sequence."""
    pts = np.asarray(pts, np.float32)
    n = len(pts)
    nb = _bucket(max(n, 1024))
    M = nb // 8
    planes = np.zeros((48, M), np.float32)
    for ch in range(6):
        col = np.full(nb, _SENTINEL if ch < 3 else 0.0, np.float32)
        col[:n] = pts[:, ch]
        planes[ch * 8:(ch + 1) * 8] = col.reshape(8, M)
    scal = np.array([[float(starting_point), eps]], np.float32)
    acc8, sign8 = _greedy_pallas_padded(jnp.asarray(planes), jnp.asarray(scal))
    acc = np.asarray(acc8).reshape(-1)[:n]
    sign = np.asarray(sign8).reshape(-1)[:n]
    return acc, sign
