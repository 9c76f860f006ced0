"""Dipole / mirror ("xie") field kernels — blocked JAX implementations.

Physics (capability parity with reference field_utils.py, no code copied):
  potential   phi_i = sum_j  p_j.R_ij / |R_ij|^3          (field_utils.py:12-55)
  field       E_i   = -sum_j (3(p_j.Rhat)Rhat - p_j) / (|R|^3 + eps),
              zero-distance pairs contribute nothing      (field_utils.py:61-116)
  xie field   f_ij  = (n_j - C (n_j.Rhat) Rhat) / |R|^3   (field_utils.py:431-469)
              (undivided raw n_j at |R| = 0)
with R_ij = source_j - target_i.

TPU-first design notes:
  * The reference bounds its O(N*M) pair tensor by *recursively halving* in
    Python (field_utils.py:23-44).  Here the pair space is tiled statically:
    an outer `lax.map` over fixed-size target blocks and an inner `lax.scan`
    over source blocks with an on-chip accumulator — the flash-attention
    streaming pattern.  Shapes are static, XLA fuses the whole pipeline, and
    there is no host round-trip per tile.
  * Pair displacement R is computed *directly* per tile (not via the
    |s|^2+|t|^2-2st expansion) so exactly-coincident points produce exact
    zeros — the reference's zero-distance masking semantics depend on it.
  * Padding uses a far-away sentinel position with zero moment, which
    contributes exactly 0 to every reduction, so no masking is needed in the
    hot loop.
  * Interaction *matrices* (I[i,j] = field of j dotted with normal of i) are
    first-class here because every propagation loop downstream is linear in
    per-source sign — precomputing I turns the reference's sequential
    field-update loops into cheap scans (see ops/propagate.py).

A Pallas VMEM-tiled variant of the hottest kernels lives in
ops/fields_pallas.py; this module is the reference implementation and the
fallback for CPU tests.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST

__all__ = [
    "potential", "field_grad", "measure_mean_potential", "reference_field",
    "dipole_interaction_matrix", "point_group_interaction",
    "xie_interaction_matrix", "field_edge_calculator",
    "field_edge_calculator_bool", "field_edge_calculator_count",
    "self_interaction", "self_interaction_all", "random_self_interaction",
]

# Default tile sizes: (8,128)-aligned, big enough to amortize loop overhead,
# small enough that the (T, S, 3) pair tile stays cache/VMEM friendly.
BLOCK_T = 1024
BLOCK_S = 1024
_SENTINEL = 1.0e6  # padding position; moment 0 => contributes exactly 0


def pow2_bucket(n: int) -> int:
    """Next power of two >= n — the batch-axis bucket shared by every
    vmapped micro-batching core (a handful of compiled shapes instead of
    one per distinct batch size)."""
    b = 1
    while b < n:
        b *= 2
    return b


def _pad_rows(x: jnp.ndarray, block: int, fill: float = 0.0) -> jnp.ndarray:
    n = x.shape[0]
    rem = (-n) % block
    if rem == 0:
        return x
    pad = jnp.full((rem,) + x.shape[1:], fill, dtype=x.dtype)
    return jnp.concatenate([x, pad], axis=0)


def _prep_sources(sources, rows: int | None = None) -> jnp.ndarray:
    """Pad sources with sentinel position / zero moment, to `rows` rows
    (default: the next BLOCK_S multiple)."""
    src = jnp.asarray(sources, dtype=jnp.float32)
    n = src.shape[0]
    rem = (rows - n) if rows is not None else (-n) % BLOCK_S
    if rem:
        pad = jnp.concatenate(
            [jnp.full((rem, 3), _SENTINEL, jnp.float32), jnp.zeros((rem, 3), jnp.float32)],
            axis=1,
        )
        src = jnp.concatenate([src, pad], axis=0)
    return src


def _prep_targets(targets, want_normals: bool = False) -> jnp.ndarray:
    tgt = jnp.asarray(targets, dtype=jnp.float32)
    cols = 6 if want_normals else 3
    if tgt.shape[1] < cols:
        tgt = jnp.concatenate(
            [tgt, jnp.zeros((tgt.shape[0], cols - tgt.shape[1]), jnp.float32)], axis=1
        )
    tgt = tgt[:, :cols]
    return _pad_rows(tgt, BLOCK_T, fill=_SENTINEL)


# ---------------------------------------------------------------------------
# Pair-tile primitives
# ---------------------------------------------------------------------------

def _field_tile_sum(tgt_pos: jnp.ndarray, src: jnp.ndarray, eps) -> jnp.ndarray:
    s_pos, p = src[:, :3], src[:, 3:6]
    R = s_pos[None, :, :] - tgt_pos[:, None, :]            # (T,S,3)
    r2 = jnp.sum(R * R, axis=-1)                           # (T,S)
    zero = r2 == 0.0
    r = jnp.sqrt(r2)
    denom = r * r2 + eps                                   # |R|^3 + eps
    c = jnp.einsum("sk,tsk->ts", p, R, precision=_HI)                     # p_j . R_ij
    safe_r2 = jnp.where(zero, 1.0, r2)
    t = 1.0 / (safe_r2 * denom)                            # one divide per pair
    a = jnp.where(zero, 0.0, 3.0 * c * t)                  # coeff of R
    b = jnp.where(zero, 0.0, safe_r2 * t)                  # coeff of p (1/denom)
    term_R = jnp.einsum("ts,tsk->tk", a, R, precision=_HI)
    term_p = jnp.einsum("ts,sk->tk", b, p, precision=_HI)
    return -(term_R - term_p)                              # E = -(sum)


def _potential_tile_sum(tgt_pos: jnp.ndarray, src: jnp.ndarray) -> jnp.ndarray:
    s_pos, p = src[:, :3], src[:, 3:6]
    R = s_pos[None, :, :] - tgt_pos[:, None, :]
    r2 = jnp.sum(R * R, axis=-1)
    r3 = r2 * jnp.sqrt(r2)
    c = jnp.einsum("sk,tsk->ts", p, R, precision=_HI)
    # No eps and no masking: coincident pairs yield inf/nan which poison the
    # target's total, then get scrubbed to 0 — reference semantics
    # (field_utils.py:49-55).
    return jnp.sum(c / r3, axis=-1)


@partial(jax.jit, static_argnames=())
def _field_grad_padded(src: jnp.ndarray, tgt: jnp.ndarray, eps: jnp.ndarray):
    src_blocks = src.reshape(-1, BLOCK_S, 6)
    tgt_blocks = tgt.reshape(-1, BLOCK_T, 3)

    def per_target_block(tb):
        def step(acc, sb):
            return acc + _field_tile_sum(tb, sb, eps), None
        acc, _ = jax.lax.scan(step, jnp.zeros((BLOCK_T, 3), jnp.float32), src_blocks)
        return acc

    E = jax.lax.map(per_target_block, tgt_blocks)
    E = E.reshape(-1, 3)
    return jnp.where(jnp.isfinite(E), E, 0.0)


@partial(jax.jit, static_argnames=())
def _potential_padded(src: jnp.ndarray, tgt: jnp.ndarray):
    src_blocks = src.reshape(-1, BLOCK_S, 6)
    tgt_blocks = tgt.reshape(-1, BLOCK_T, 3)

    def per_target_block(tb):
        def step(acc, sb):
            return acc + _potential_tile_sum(tb, sb), None
        acc, _ = jax.lax.scan(step, jnp.zeros((BLOCK_T,), jnp.float32), src_blocks)
        return acc

    phi = jax.lax.map(per_target_block, tgt_blocks).reshape(-1)
    return jnp.where(jnp.isfinite(phi), phi, 0.0)


def _pallas_enabled() -> bool:
    """Platform/env gate alone — no size limit (each kernel family has its
    own capacity ceiling: MAX_PALLAS_SOURCES for the field panels,
    MAX_PALLAS_GREEDY / MAX_PALLAS_STREAMED for the greedy kernels)."""
    import os

    if os.environ.get("DIPOLE_TPU_NO_PALLAS"):
        return False
    from dipole_tpu.ops import fields_pallas

    return fields_pallas.available()


def _use_pallas(n_sources: int) -> bool:
    from dipole_tpu.ops import fields_pallas

    return _pallas_enabled() and n_sources <= fields_pallas.MAX_PALLAS_SOURCES


def field_grad(sources, targets, eps: float = 1e-5) -> jnp.ndarray:
    """Dipole field E at `targets` from dipole `sources` (N_t, 3).

    sources: (M, 6) position+moment. targets: (N, >=3), positions used.
    Equivalent math to reference field_utils.field_grad (:61-116) including
    zero-distance masking and inf/nan scrubbing; tiling replaces recursion.
    On TPU this dispatches to the Pallas VMEM-tiled kernel
    (ops/fields_pallas.py); the XLA-blocked path is the CPU/large-source
    fallback."""
    n = np.shape(targets)[0]
    if _use_pallas(np.shape(sources)[0]):
        from dipole_tpu.ops.fields_pallas import field_grad_pallas

        return field_grad_pallas(sources, targets, eps)
    src = _prep_sources(sources)
    tgt = _prep_targets(targets)
    return _field_grad_padded(src, tgt, jnp.float32(eps))[:n]


def potential(sources, targets, eps: float = 1e-5) -> jnp.ndarray:
    """Dipole potential phi at targets (reference field_utils.py:12-55)."""
    n = np.shape(targets)[0]
    if _use_pallas(np.shape(sources)[0]):
        from dipole_tpu.ops.fields_pallas import potential_pallas

        return potential_pallas(sources, targets)
    src = _prep_sources(sources)
    tgt = _prep_targets(targets)
    return _potential_padded(src, tgt)[:n]


_GRID_CACHE: dict[int, np.ndarray] = {}


def measure_mean_potential(pc) -> float:
    """Mean dipole potential over the 10^3 lattice (reference
    field_utils.py:7-9 + util.gen_grid util.py:26-36). Callers flip all
    normals when this is negative."""
    from dipole_tpu.utils.io import gen_grid

    grid = _GRID_CACHE.setdefault(10, gen_grid(10))
    return float(jnp.mean(potential(pc, grid)))


@jax.jit
def _mean_potential_vmapped(src_pad, tgt_pad, n_grid):
    def one(src):
        phi = _potential_padded(src, tgt_pad)
        w = jnp.arange(phi.shape[0]) < n_grid
        return jnp.sum(jnp.where(w, phi, 0.0)) / n_grid

    return jax.vmap(one)(src_pad)


def measure_mean_potential_batched(pcs) -> np.ndarray:
    """Mean lattice potential for several clouds in one vmapped dispatch —
    the server micro-batching form of the global sign fix."""
    from dipole_tpu.utils.io import gen_grid

    if not len(pcs):
        return np.zeros((0,), np.float32)
    grid = _GRID_CACHE.setdefault(10, gen_grid(10))
    rows = -(-max(len(p) for p in pcs) // BLOCK_S) * BLOCK_S
    B = len(pcs)
    Bp = pow2_bucket(B)            # pow2 batch bucket: a handful of compiles
    src = np.zeros((Bp, rows, 6), np.float32)
    src[:, :, :3] = _SENTINEL
    for i in range(Bp):
        p = pcs[min(i, B - 1)]
        src[i, : len(p)] = np.asarray(p, np.float32)
    tgt = np.asarray(_prep_targets(grid))
    means = _mean_potential_vmapped(jnp.asarray(src), jnp.asarray(tgt),
                                    jnp.float32(len(grid)))
    return np.asarray(means)[:B]


def reference_field(ref_pc, target_pc) -> np.ndarray:
    """Orientation transfer from an oriented cloud (reference
    field_utils.py:188-201): evaluate the reference field at target points;
    targets without normals adopt the normalized field as their normal,
    targets with normals only take the sign of E.n."""
    ref_pc = np.asarray(ref_pc, dtype=np.float32)
    target_pc = np.asarray(target_pc, dtype=np.float32)
    E = np.asarray(field_grad(ref_pc, target_pc))
    if target_pc.shape[1] == 3:
        length = np.linalg.norm(E, axis=-1)
        nz = length != 0
        En = E.copy()
        En[nz] = E[nz] / length[nz, None]
        return np.concatenate([target_pc, En], axis=1)
    out = target_pc.copy()
    inter = (E * out[:, 3:6]).sum(axis=-1)
    sign = (inter >= 0).astype(np.float32) * 2 - 1
    out[:, 3:6] *= sign[:, None]
    return out


# ---------------------------------------------------------------------------
# Interaction matrices (the propagation loops' workhorse)
# ---------------------------------------------------------------------------

def _dipole_interaction_tile(tgt: jnp.ndarray, src: jnp.ndarray, eps) -> jnp.ndarray:
    """I[t, s] = E_s(x_t) . n_t for one tile. tgt (T,6), src (S,6)."""
    t_pos, t_n = tgt[:, :3], tgt[:, 3:6]
    s_pos, p = src[:, :3], src[:, 3:6]
    R = s_pos[None, :, :] - t_pos[:, None, :]
    r2 = jnp.sum(R * R, axis=-1)
    zero = r2 == 0.0
    r = jnp.sqrt(r2)
    denom = r * r2 + eps
    c = jnp.einsum("sk,tsk->ts", p, R, precision=_HI)
    Rn = jnp.einsum("tk,tsk->ts", t_n, R, precision=_HI)                  # R_ij . n_i
    pn = jnp.einsum("sk,tk->ts", p, t_n, precision=_HI)                   # p_j . n_i
    safe_r2 = jnp.where(zero, 1.0, r2)
    I = -(3.0 * c * Rn / (safe_r2 * denom) - pn / denom)
    I = jnp.where(zero, 0.0, I)
    return jnp.where(jnp.isfinite(I), I, 0.0)


def _xie_interaction_tile(tgt: jnp.ndarray, src: jnp.ndarray, C) -> jnp.ndarray:
    """I[t, s] = xie field of source s at target t, dotted with n_t.

    xie (mirror) field: f = n_s - C (n_s.Rhat) Rhat, scaled by 1/|R|^3 for
    |R| > 0, left unscaled at |R| = 0 (reference field_utils.py:431-469,
    509-519)."""
    t_pos, t_n = tgt[:, :3], tgt[:, 3:6]
    s_pos, s_n = src[:, :3], src[:, 3:6]
    R = s_pos[None, :, :] - t_pos[:, None, :]
    r2 = jnp.sum(R * R, axis=-1)
    zero = r2 == 0.0
    r = jnp.sqrt(r2)
    safe_r = jnp.where(zero, 1.0, r)
    nsR = jnp.einsum("sk,tsk->ts", s_n, R, precision=_HI) / safe_r        # n_s . Rhat
    ntR = jnp.einsum("tk,tsk->ts", t_n, R, precision=_HI) / safe_r        # n_t . Rhat
    nn = jnp.einsum("sk,tk->ts", s_n, t_n, precision=_HI)                 # n_s . n_t
    core = nn - C * nsR * ntR
    r3 = r2 * r
    I = jnp.where(zero, nn, core / jnp.where(zero, 1.0, r3))
    return jnp.where(jnp.isfinite(I), I, 0.0)


def _matrix_blocked(tile_fn, tgt6: jnp.ndarray, src6: jnp.ndarray, *args) -> jnp.ndarray:
    """Assemble a full (N_t, N_s) interaction matrix from tiles."""
    src_blocks = src6.reshape(-1, BLOCK_S, 6)
    tgt_blocks = tgt6.reshape(-1, BLOCK_T, 6)

    def per_target_block(tb):
        def step(_, sb):
            return None, tile_fn(tb, sb, *args)
        _, rows = jax.lax.scan(step, None, src_blocks)      # (nsb, T, S)
        return jnp.swapaxes(rows, 0, 1).reshape(BLOCK_T, -1)

    out = jax.lax.map(per_target_block, tgt_blocks)
    return out.reshape(-1, src_blocks.shape[0] * BLOCK_S)


@jax.jit
def _dipole_matrix_padded(tgt6, src6, eps):
    return _matrix_blocked(_dipole_interaction_tile, tgt6, src6, eps)


@jax.jit
def _xie_matrix_padded(tgt6, src6, C):
    return _matrix_blocked(_xie_interaction_tile, tgt6, src6, C)


def _prep_targets6(targets, block: int, rows: int | None = None) -> jnp.ndarray:
    """Pad (N, 6) targets up to `rows` (default: next `block` multiple) with
    sentinel positions and ZERO normals. Zero normals make every interaction
    tile exactly 0 on padded target rows (both kernels end with a `. n_t`
    factor), matching the exact-zero columns of zero-moment padded sources —
    so a matrix computed at a padded size needs no post-slicing."""
    tgt = jnp.asarray(targets, jnp.float32)
    want = rows if rows is not None else tgt.shape[0] + (-tgt.shape[0]) % block
    rem = want - tgt.shape[0]
    if rem:
        pad = jnp.concatenate(
            [jnp.full((rem, 3), _SENTINEL, jnp.float32),
             jnp.zeros((rem, tgt.shape[1] - 3), jnp.float32)], axis=1)
        tgt = jnp.concatenate([tgt, pad], axis=0)
    return tgt


def dipole_interaction_matrix(pts, eps: float = 1e-6, targets=None,
                              bucket: int | None = None) -> jnp.ndarray:
    """I[i, j] = (dipole field of point j evaluated at point i) . n_i.

    Every greedy propagation variant is linear in the per-source sign, so a
    single precomputed I turns the reference's per-step field updates
    (field_utils.py:353-388) into I-row accumulations.

    bucket: compute directly at (bucket, bucket) with exactly-zero padded
    rows/columns and no post-slice — one live full-size array instead of
    three (matters at 30k+: each copy is N^2 * 4 bytes). Requires
    targets=None and bucket a multiple of BLOCK_T/BLOCK_S >= len(pts)."""
    if bucket is not None:
        if targets is not None or bucket % BLOCK_T != 0 \
                or bucket % BLOCK_S != 0 or bucket < np.shape(pts)[0]:
            raise ValueError(
                "bucket= requires targets=None and bucket a multiple of "
                f"{BLOCK_T}/{BLOCK_S} covering len(pts); got bucket={bucket}, "
                f"n={np.shape(pts)[0]}")
        tgt = _prep_targets6(pts, BLOCK_T, rows=bucket)
        src = _prep_sources(pts, rows=bucket)
        return _dipole_matrix_padded(tgt, src, jnp.float32(eps))
    src = _prep_sources(pts)
    m = np.shape(pts)[0]
    if targets is None:
        targets = pts
    n = np.shape(targets)[0]
    tgt = _prep_targets6(targets, BLOCK_T)
    return _dipole_matrix_padded(tgt, src, jnp.float32(eps))[:n, :m]


def xie_interaction_matrix(pts, C: float = 3.0, targets=None, knn_mask=None,
                           bucket: int | None = None) -> jnp.ndarray:
    """Mirror-field interaction matrix (reference xie_intersaction,
    field_utils.py:509-519). knn_mask: optional (N_t, N_s) 0/1 array keeping
    pair (i, j) iff target i is among source j's k nearest targets
    (reference field_utils.py:449-458). bucket: as in
    dipole_interaction_matrix (exact-zero padded, no post-slice)."""
    if bucket is not None:
        if targets is not None or knn_mask is not None \
                or bucket % BLOCK_T != 0 or bucket % BLOCK_S != 0 \
                or bucket < np.shape(pts)[0]:
            raise ValueError(
                "bucket= requires targets=None, knn_mask=None and bucket a "
                f"multiple of {BLOCK_T}/{BLOCK_S} covering len(pts); got "
                f"bucket={bucket}, n={np.shape(pts)[0]}")
        tgt = _prep_targets6(pts, BLOCK_T, rows=bucket)
        src = _prep_sources(pts, rows=bucket)
        return _xie_matrix_padded(tgt, src, jnp.float32(C))
    src = _prep_sources(pts)
    if targets is None:
        targets = pts
    n = np.shape(targets)[0]
    m = np.shape(pts)[0]
    tgt = _prep_targets6(targets, BLOCK_T)
    I = _xie_matrix_padded(tgt, src, jnp.float32(C))[:n, :m]
    if knn_mask is not None:
        I = I * jnp.asarray(knn_mask, jnp.float32)
    return I


@jax.jit
def _group_interaction_padded(tgt6, src6, onehot, eps):
    """F[t, g] = sum_{j in group g} I[t, j], without materializing I."""
    src_blocks = src6.reshape(-1, BLOCK_S, 6)
    oh_blocks = onehot.reshape(src_blocks.shape[0], BLOCK_S, -1)
    tgt_blocks = tgt6.reshape(-1, BLOCK_T, 6)

    def per_target_block(tb):
        def step(acc, sb_oh):
            sb, oh = sb_oh
            I = _dipole_interaction_tile(tb, sb, eps)       # (T,S)
            return acc + jnp.dot(I, oh, preferred_element_type=jnp.float32), None
        acc0 = jnp.zeros((BLOCK_T, onehot.shape[-1]), jnp.float32)
        acc, _ = jax.lax.scan(step, acc0, (src_blocks, oh_blocks))
        return acc

    F = jax.lax.map(per_target_block, tgt_blocks)
    return F.reshape(-1, onehot.shape[-1])


def point_group_interaction(pts, group_ids, num_groups: int, eps: float = 1e-5,
                            source_weights=None) -> jnp.ndarray:
    """F[i, g] = sum over sources j in group g of I[i, j].

    This is the TPU-native core of patch propagation: patch->patch weights
    are F segment-summed over targets, and the diffuse per-point re-vote
    (reference field_utils.py:326-342) reads F rows directly.
    source_weights optionally scales each source's moment (weighted_prop)."""
    pts = jnp.asarray(pts, jnp.float32)
    if source_weights is not None:
        w = jnp.asarray(source_weights, jnp.float32)
        pts = pts.at[:, 3:6].multiply(w[:, None])
    n = pts.shape[0]
    src = _prep_sources(pts)
    tgt = _pad_rows(pts, BLOCK_T, _SENTINEL)
    padded_groups = -(-num_groups // 128) * 128  # lane-aligned group axis
    onehot = jax.nn.one_hot(jnp.asarray(group_ids), padded_groups, dtype=jnp.float32)
    onehot = _pad_rows(onehot, BLOCK_S, 0.0)
    return _group_interaction_padded(tgt, src, onehot, jnp.float32(eps))[:n, :num_groups]


# ---------------------------------------------------------------------------
# Edge calculators / self-interaction diagnostics
# ---------------------------------------------------------------------------

def field_edge_calculator(sources, targets, if_save: bool = False):
    """Patch-patch interaction weight (reference field_utils.py:145-160):
    w = (2 * sum E(S->T).n_T / |S|) * |T|  (that operator order is the
    reference's), and its negation."""
    E = field_grad(sources, np.asarray(targets)[:, :3])
    inter = float(jnp.sum(E * jnp.asarray(targets, jnp.float32)[:, 3:6]))
    w = inter * 2.0 / np.shape(sources)[0] * np.shape(targets)[0]
    return w, -w


def field_edge_calculator_bool(sources, targets, if_save: bool = False):
    w, _ = field_edge_calculator(sources, targets, if_save)
    return (1, -1) if w > 0 else (-1, 1)


def field_edge_calculator_count(sources, targets, if_save: bool = False):
    w, _ = field_edge_calculator(sources, targets, if_save)
    n = np.shape(sources)[0] * np.shape(targets)[0]
    return (n, -n) if w > 0 else (-n, n)


def self_interaction(nxyz, eps: float = 1e-5, rng: np.random.Generator | None = None):
    """Interaction between a random half-split of a cloud (reference
    field_utils.py:163-171)."""
    nxyz = np.asarray(nxyz)
    assert nxyz.shape[1] == 6
    rng = rng or np.random.default_rng()
    num = nxyz.shape[0]
    mask = np.ones(num, dtype=bool)
    mask[rng.permutation(num)[: num // 2]] = False
    w, _ = field_edge_calculator(nxyz[mask], nxyz[~mask])
    return w


def self_interaction_all(nxyz, eps: float = 1e-5):
    w, _ = field_edge_calculator(nxyz, nxyz)
    return w


def random_self_interaction(nxyz, eps: float = 1e-5, rng: np.random.Generator | None = None):
    nxyz = np.asarray(nxyz).copy()
    assert nxyz.shape[1] == 6
    rng = rng or np.random.default_rng()
    flip = np.zeros(nxyz.shape[0], dtype=bool)
    flip[rng.permutation(nxyz.shape[0])[: nxyz.shape[0] // 2]] = True
    nxyz[flip, 3:] *= -1
    w, _ = field_edge_calculator(nxyz, nxyz)
    return w


def xie_distance(sources, targets) -> jnp.ndarray:
    """Per-target sum over sources of |n_s elementwise* R| (reference
    field_utils.py:522-526)."""
    src = jnp.asarray(sources, jnp.float32)
    tgt = jnp.asarray(targets, jnp.float32)
    R = src[None, :, :3] - tgt[:, None, :3]
    prod = src[None, :, 3:6] * R
    return jnp.linalg.norm(prod, axis=-1).sum(axis=-1)
