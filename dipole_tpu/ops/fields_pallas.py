"""Pallas TPU kernels for the pairwise dipole field/potential.

The XLA-blocked implementation in ops/fields.py materializes (T, S, 3) pair
tiles through HBM; these kernels keep everything in VMEM with a
structure-of-arrays layout: clouds are passed as (8, N) channel-major
arrays (rows x, y, z[, px, py, pz], zero-padded to the 8-sublane tile) so
the point axis rides the 128-wide lanes.

Channel-major is extremely compact — 32 bytes/point — so the *entire source
cloud* fits in VMEM up to ~300k points. Each grid step owns one target block
and streams source chunks with an in-register accumulator (flash-attention
style) via a fori_loop; the output block is written exactly once. (An
output-revisiting 2D grid formulation hits a backend FailedPrecondition on
this TPU runtime, hence the 1D grid + inner loop.)

Sources beyond the VMEM budget fall back to the XLA-blocked implementation
at the dispatch layer (ops/fields.py), which remains the reference semantics.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["field_grad_pallas", "potential_pallas", "available",
           "MAX_PALLAS_SOURCES"]

T_BLK = 256
S_BLK = 512
_SENTINEL = 1.0e6
# (8, N) f32 source panel must fit comfortably in ~16 MB VMEM next to the
# pair-tile intermediates. Measured on the v5e (tools/crossover_bench.py,
# 2026-08-16, 65536 targets): pallas/xla GPairs/s = 28.8/21.2 at 131k,
# 50.0/22.6 at 262k, 37.8/22.7 at 327k, 21.9/22.8 at 393k (VMEM pressure),
# compile failure at 524k — so the panel pays until ~327k and the XLA
# streaming path takes over beyond that.
MAX_PALLAS_SOURCES = 327680


def available() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:
        return False


def _pair_terms(tt, s_chunk, eps):
    """Shared per-chunk pair math. tt (T_BLK, 8) target slice, s_chunk
    (8, S_BLK). Returns (ex, ey, ez) partial field sums, (T_BLK, 1) each."""
    tx, ty, tz = tt[:, 0:1], tt[:, 1:2], tt[:, 2:3]
    sx, sy, sz = s_chunk[0:1, :], s_chunk[1:2, :], s_chunk[2:3, :]
    px, py, pz = s_chunk[3:4, :], s_chunk[4:5, :], s_chunk[5:6, :]
    Rx = sx - tx
    Ry = sy - ty
    Rz = sz - tz
    r2 = Rx * Rx + Ry * Ry + Rz * Rz
    zero = r2 == 0.0
    r = jnp.sqrt(r2)
    denom = r * r2 + eps
    c = px * Rx + py * Ry + pz * Rz
    safe_r2 = jnp.where(zero, 1.0, r2)
    # one reciprocal serves both coefficients: t = 1/(r2*denom), so
    # a = 3c/(r2*denom) = 3c*t and b = 1/denom = r2*t — the divide unit is
    # the kernel's bottleneck (see BASELINE.md roofline)
    t = 1.0 / (safe_r2 * denom)
    a = jnp.where(zero, 0.0, 3.0 * c * t)
    b = jnp.where(zero, 0.0, safe_r2 * t)
    # E = -(sum a*R - sum b*p)  ->  acc = sum (b*p - a*R)
    ex = jnp.sum(b * px - a * Rx, axis=1, keepdims=True)
    ey = jnp.sum(b * py - a * Ry, axis=1, keepdims=True)
    ez = jnp.sum(b * pz - a * Rz, axis=1, keepdims=True)
    return ex, ey, ez


def _field_kernel(t_ref, s_ref, eps_ref, o_ref):
    eps = eps_ref[0, 0]
    tt = jnp.transpose(t_ref[:])                 # (T_BLK, 8)
    n_chunks = s_ref.shape[1] // S_BLK

    def body(j, acc):
        off = pl.multiple_of(j * S_BLK, S_BLK)
        sc = s_ref[:, pl.ds(off, S_BLK)]
        ex, ey, ez = _pair_terms(tt, sc, eps)
        return acc + jnp.concatenate(
            [ex, ey, ez, jnp.zeros((ex.shape[0], 5), jnp.float32)], axis=1
        )

    acc = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((t_ref.shape[1], 8), jnp.float32)
    )
    o_ref[:] = jnp.transpose(acc)


def _potential_kernel(t_ref, s_ref, o_ref):
    tt = jnp.transpose(t_ref[:])
    tx, ty, tz = tt[:, 0:1], tt[:, 1:2], tt[:, 2:3]
    n_chunks = s_ref.shape[1] // S_BLK

    def body(j, acc):
        off = pl.multiple_of(j * S_BLK, S_BLK)
        sc = s_ref[:, pl.ds(off, S_BLK)]
        sx, sy, sz = sc[0:1, :], sc[1:2, :], sc[2:3, :]
        px, py, pz = sc[3:4, :], sc[4:5, :], sc[5:6, :]
        Rx = sx - tx
        Ry = sy - ty
        Rz = sz - tz
        r2 = Rx * Rx + Ry * Ry + Rz * Rz
        r3 = r2 * jnp.sqrt(r2)
        c = px * Rx + py * Ry + pz * Rz
        return acc + jnp.sum(c / r3, axis=1, keepdims=True)

    acc = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((t_ref.shape[1], 1), jnp.float32)
    )
    out = jnp.concatenate(
        [acc, jnp.zeros((acc.shape[0], 7), jnp.float32)], axis=1
    )
    o_ref[:] = jnp.transpose(out)


@partial(jax.jit, static_argnames=())
def _field_pallas_padded(src8: jnp.ndarray, tgt8: jnp.ndarray, eps: jnp.ndarray):
    nT = tgt8.shape[1] // T_BLK
    return pl.pallas_call(
        _field_kernel,
        grid=(nT,),
        in_specs=[
            pl.BlockSpec((8, T_BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((8, T_BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, tgt8.shape[1]), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=25 * tgt8.shape[1] * src8.shape[1],
            bytes_accessed=(tgt8.size * 2 + src8.size * nT) * 4,
            transcendentals=tgt8.shape[1] * src8.shape[1],
        ),
    )(tgt8, src8, eps)


@partial(jax.jit, static_argnames=())
def _potential_pallas_padded(src8: jnp.ndarray, tgt8: jnp.ndarray):
    nT = tgt8.shape[1] // T_BLK
    return pl.pallas_call(
        _potential_kernel,
        grid=(nT,),
        in_specs=[
            pl.BlockSpec((8, T_BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, T_BLK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, tgt8.shape[1]), jnp.float32),
    )(tgt8, src8)


def _to_channel_major(arr: np.ndarray, n_pad: int, sentinel_pos: bool) -> np.ndarray:
    """(N, C) float32 -> (8, n_pad) channel-major with sentinel/zero padding."""
    n, c = arr.shape
    out = np.zeros((8, n_pad), dtype=np.float32)
    out[:c, :n] = arr.T
    if sentinel_pos and n_pad > n:
        out[:3, n:] = _SENTINEL
    return out


def field_grad_pallas(sources, targets, eps: float = 1e-5) -> jnp.ndarray:
    """Drop-in for ops.fields.field_grad on TPU (same math + scrubbing)."""
    src = np.asarray(sources, np.float32)
    tgt = np.asarray(targets, np.float32)[:, :3]
    n = len(tgt)
    sp = -((-len(src)) // S_BLK) * S_BLK
    tp = -((-n) // T_BLK) * T_BLK
    src8 = _to_channel_major(src[:, :6], sp, sentinel_pos=True)
    tgt8 = _to_channel_major(tgt, tp, sentinel_pos=True)
    out = _field_pallas_padded(jnp.asarray(src8), jnp.asarray(tgt8),
                               jnp.full((1, 1), eps, jnp.float32))
    E = jnp.transpose(out[:3, :n])
    return jnp.where(jnp.isfinite(E), E, 0.0)


def potential_pallas(sources, targets) -> jnp.ndarray:
    src = np.asarray(sources, np.float32)
    tgt = np.asarray(targets, np.float32)[:, :3]
    n = len(tgt)
    sp = -((-len(src)) // S_BLK) * S_BLK
    tp = -((-n) // T_BLK) * T_BLK
    src8 = _to_channel_major(src[:, :6], sp, sentinel_pos=True)
    tgt8 = _to_channel_major(tgt, tp, sentinel_pos=True)
    out = _potential_pallas_padded(jnp.asarray(src8), jnp.asarray(tgt8))
    phi = out[0, :n]
    return jnp.where(jnp.isfinite(phi), phi, 0.0)


# ---------------------------------------------------------------------------
# Interaction-matrix kernels: I[i, j] = (field of source j at target i).n_i.
# 2D grid, every output block written exactly once (no revisiting).
# NOTE: numerically validated, but NOT the default dispatch — on this
# backend their first-execution compile (~5 min) dwarfs the XLA-blocked
# version's (~6 s) while warm times are indistinguishable (the matrix is
# consumed on device either way). Kept for runtimes with sane compile costs.
# ---------------------------------------------------------------------------

def _dipole_imatrix_kernel(t_ref, s_ref, eps_ref, o_ref):
    eps = eps_ref[0, 0]
    tt = jnp.transpose(t_ref[:])                 # (T_BLK, 8)
    tx, ty, tz = tt[:, 0:1], tt[:, 1:2], tt[:, 2:3]
    nx, ny, nz = tt[:, 3:4], tt[:, 4:5], tt[:, 5:6]
    sx, sy, sz = s_ref[0:1, :], s_ref[1:2, :], s_ref[2:3, :]
    px, py, pz = s_ref[3:4, :], s_ref[4:5, :], s_ref[5:6, :]
    Rx = sx - tx
    Ry = sy - ty
    Rz = sz - tz
    r2 = Rx * Rx + Ry * Ry + Rz * Rz
    zero = r2 == 0.0
    r = jnp.sqrt(r2)
    denom = r * r2 + eps
    c = px * Rx + py * Ry + pz * Rz
    Rn = nx * Rx + ny * Ry + nz * Rz
    pn = px * nx + py * ny + pz * nz
    safe_r2 = jnp.where(zero, 1.0, r2)
    t = 1.0 / (safe_r2 * denom)                  # single divide per pair
    I = -t * (3.0 * c * Rn - pn * safe_r2)
    I = jnp.where(zero, 0.0, I)
    o_ref[:] = jnp.where(jnp.isfinite(I), I, 0.0)


def _xie_imatrix_kernel(t_ref, s_ref, c_ref, o_ref):
    C = c_ref[0, 0]
    tt = jnp.transpose(t_ref[:])
    tx, ty, tz = tt[:, 0:1], tt[:, 1:2], tt[:, 2:3]
    nx, ny, nz = tt[:, 3:4], tt[:, 4:5], tt[:, 5:6]
    sx, sy, sz = s_ref[0:1, :], s_ref[1:2, :], s_ref[2:3, :]
    px, py, pz = s_ref[3:4, :], s_ref[4:5, :], s_ref[5:6, :]
    Rx = sx - tx
    Ry = sy - ty
    Rz = sz - tz
    r2 = Rx * Rx + Ry * Ry + Rz * Rz
    zero = r2 == 0.0
    r = jnp.sqrt(r2)
    safe_r = jnp.where(zero, 1.0, r)
    nsR = (px * Rx + py * Ry + pz * Rz) / safe_r
    ntR = (nx * Rx + ny * Ry + nz * Rz) / safe_r
    nn = px * nx + py * ny + pz * nz
    core = nn - C * nsR * ntR
    r3 = r2 * r
    I = jnp.where(zero, nn, core / jnp.where(zero, 1.0, r3))
    o_ref[:] = jnp.where(jnp.isfinite(I), I, 0.0)


def _imatrix_call(kernel, tgt8, src8, scalar):
    nT = tgt8.shape[1] // T_BLK
    nS = src8.shape[1] // S_BLK
    return pl.pallas_call(
        kernel,
        grid=(nT, nS),
        in_specs=[
            pl.BlockSpec((8, T_BLK), lambda i, j: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, S_BLK), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((T_BLK, S_BLK), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tgt8.shape[1], src8.shape[1]),
                                       jnp.float32),
    )(tgt8, src8, scalar)


@partial(jax.jit, static_argnames=())
def _dipole_imatrix_padded(tgt8, src8, eps):
    return _imatrix_call(_dipole_imatrix_kernel, tgt8, src8, eps)


@partial(jax.jit, static_argnames=())
def _xie_imatrix_padded(tgt8, src8, C):
    return _imatrix_call(_xie_imatrix_kernel, tgt8, src8, C)


def dipole_interaction_matrix_pallas(pts, eps: float = 1e-6, targets=None):
    pts = np.asarray(pts, np.float32)
    tgt = pts if targets is None else np.asarray(targets, np.float32)
    n, m = len(tgt), len(pts)
    sp = -((-m) // S_BLK) * S_BLK
    tp = -((-n) // T_BLK) * T_BLK
    src8 = _to_channel_major(pts[:, :6], sp, sentinel_pos=True)
    tgt8 = _to_channel_major(tgt[:, :6], tp, sentinel_pos=True)
    out = _dipole_imatrix_padded(jnp.asarray(tgt8), jnp.asarray(src8),
                                 jnp.full((1, 1), eps, jnp.float32))
    return out[:n, :m]


def xie_interaction_matrix_pallas(pts, C: float = 3.0, targets=None):
    pts = np.asarray(pts, np.float32)
    tgt = pts if targets is None else np.asarray(targets, np.float32)
    n, m = len(tgt), len(pts)
    sp = -((-m) // S_BLK) * S_BLK
    tp = -((-n) // T_BLK) * T_BLK
    src8 = _to_channel_major(pts[:, :6], sp, sentinel_pos=True)
    tgt8 = _to_channel_major(tgt[:, :6], tp, sentinel_pos=True)
    out = _xie_imatrix_padded(jnp.asarray(tgt8), jnp.asarray(src8),
                              jnp.full((1, 1), C, jnp.float32))
    return out[:n, :m]


# ---------------------------------------------------------------------------
# Point-group interaction kernel: F[i, g] = sum_{j in group g} I[i, j].
# The patch pipelines' hot op. Pair math fused with an on-the-fly one-hot
# contraction: per source chunk, oh[s, g] = (gid[s] == g) and the (T, S)
# interaction tile hits the MXU via dot(I, oh) into a (T, G) accumulator.
# ---------------------------------------------------------------------------

def _group_kernel(t_ref, s_ref, gid_ref, eps_ref, o_ref):
    eps = eps_ref[0, 0]
    tt = jnp.transpose(t_ref[:])                 # (T_BLK, 8)
    tx, ty, tz = tt[:, 0:1], tt[:, 1:2], tt[:, 2:3]
    nx, ny, nz = tt[:, 3:4], tt[:, 4:5], tt[:, 5:6]
    G = o_ref.shape[1]
    n_chunks = s_ref.shape[1] // S_BLK

    def body(j, acc):
        off = pl.multiple_of(j * S_BLK, S_BLK)
        sc = s_ref[:, pl.ds(off, S_BLK)]
        gid = gid_ref[:, pl.ds(off, S_BLK)]      # (1, S_BLK) int32
        sx, sy, sz = sc[0:1, :], sc[1:2, :], sc[2:3, :]
        px, py, pz = sc[3:4, :], sc[4:5, :], sc[5:6, :]
        Rx = sx - tx
        Ry = sy - ty
        Rz = sz - tz
        r2 = Rx * Rx + Ry * Ry + Rz * Rz
        zero = r2 == 0.0
        r = jnp.sqrt(r2)
        denom = r * r2 + eps
        c = px * Rx + py * Ry + pz * Rz
        Rn = nx * Rx + ny * Ry + nz * Rz
        pn = px * nx + py * ny + pz * nz
        safe_r2 = jnp.where(zero, 1.0, r2)
        t = 1.0 / (safe_r2 * denom)              # single divide per pair
        I = -t * (3.0 * c * Rn - pn * safe_r2)
        I = jnp.where(zero, 0.0, I)
        I = jnp.where(jnp.isfinite(I), I, 0.0)   # (T_BLK, S_BLK)
        gcol = jax.lax.broadcasted_iota(jnp.int32, (S_BLK, G), 1)
        oh = (jnp.transpose(gid) == gcol).astype(jnp.float32)   # (S_BLK, G)
        return acc + jnp.dot(I, oh, preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((t_ref.shape[1], o_ref.shape[1]), jnp.float32)
    )
    o_ref[:] = acc


@partial(jax.jit, static_argnames=())
def _group_pallas_padded(tgt8, src8, gid, eps, out_groups):
    nT = tgt8.shape[1] // T_BLK
    G = out_groups.shape[0]
    return pl.pallas_call(
        _group_kernel,
        grid=(nT,),
        in_specs=[
            pl.BlockSpec((8, T_BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((T_BLK, G), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tgt8.shape[1], G), jnp.float32),
    )(tgt8, src8, gid, eps)


def point_group_interaction_pallas(pts, group_ids, num_groups: int,
                                   eps: float = 1e-5, source_weights=None):
    """Pallas drop-in for ops.fields.point_group_interaction on TPU."""
    pts = np.asarray(pts, np.float32).copy()
    if source_weights is not None:
        w = np.clip(np.asarray(source_weights, np.float32), None, None)
        pts[:, 3:6] *= w[:, None]
    n = len(pts)
    G = -(-num_groups // 128) * 128
    sp = -((-n) // S_BLK) * S_BLK
    tp = -((-n) // T_BLK) * T_BLK
    src8 = _to_channel_major(pts[:, :6], sp, sentinel_pos=True)
    tgt8 = _to_channel_major(pts[:, :6], tp, sentinel_pos=True)
    gid = np.full((1, sp), -1, np.int32)         # padded sources match no group
    gid[0, :n] = np.asarray(group_ids, np.int32)
    out = _group_pallas_padded(
        jnp.asarray(tgt8), jnp.asarray(src8), jnp.asarray(gid),
        jnp.full((1, 1), eps, jnp.float32), jnp.zeros((G,), jnp.float32),
    )
    return out[:n, :num_groups]
