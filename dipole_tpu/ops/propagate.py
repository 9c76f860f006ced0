"""Greedy dipole/xie propagation loops, re-expressed for TPU.

The reference's propagation loops (field_utils.py:207-388, 536-605, 657-710)
are data-dependent Python while-loops that mutate tensors in place and call a
field kernel per step.  The key observation enabling a TPU-native design:
**every propagation variant is linear in the per-source sign** — the dipole
field of a flipped source is the negated field.  So:

  * per-point greedy ("strongest field") becomes one `lax.scan` over an
    interaction accumulator: visiting point c adds sign_c * I[:, c] where
    I[i, j] = E_j(x_i) . n_i is precomputed (matrix path, N <= 20k),
    produced on the fly per step (XLA fallback), or the entire loop runs
    inside one Pallas kernel with VMEM-resident state
    (ops/propagate_pallas.py, the large-N TPU default). Mathematically
    identical to the reference's incremental E updates
    (field_utils.py:353-388) and the same flip decisions.
  * patch-level greedy uses a patch-patch weight matrix W = segment-sums of
    the point-group interaction F (ops/fields.point_group_interaction), and
    the diffuse per-point re-vote reads F rows — no per-step field calls at
    all (reference field_utils.py:286-348).
  * order-driven multi-start replay (field_utils.py:569-605) is a batched
    `lax.scan` over a precomputed xie interaction matrix, T runs in
    lock-step.

Flip decisions replicate the reference's conventions exactly:
greedy flip when interaction < 0; diffuse re-vote keeps when
interaction > 0 (ties flip).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dipole_tpu.ops import fields
from dipole_tpu.ops import solve

__all__ = [
    "strongest_field_propagation_points",
    "strongest_field_propagation_patches",
    "strongest_field_propagation_reps",
    "xie_propagation_points",
    "xie_propagation_in_order",
    "xie_propagation_bfs_tree",
    "greedy_sign_sequence",
    "greedy_sign_sequence_batched",
    "bfs_orders",
    "align_and_vote",
    "xie_in_order_batched",
]

_HI = jax.lax.Precision.HIGHEST

# Above this point count the N x N interaction matrix no longer pays for
# itself; switch to the on-the-fly column kernel. Measured on the v5e
# (tools/crossover_bench.py, 2026-08-16): matrix wins at 8k (0.077 s vs
# 0.085), on-the-fly wins from 12k up (12k: 0.118 vs 0.141; 20k: 0.163 vs
# 0.310; 24k: 0.154 vs 0.363) and the padded matrix OOMs HBM at 32k.
MATRIX_LIMIT = 10000


def _bucket(n: int, base: int = 256) -> int:
    """Round up to the next power-of-two multiple of `base` so scan lengths
    and shapes hit a handful of compile buckets (persisted across runs)."""
    b = base
    while b < n:
        b *= 2
    return b


# batch-axis bucket for the vmapped cores (canonical def in ops/fields.py)
_pow2 = fields.pow2_bucket


# ---------------------------------------------------------------------------
# Per-point greedy propagation
# ---------------------------------------------------------------------------

@jax.jit
def _greedy_scan_matrix(I: jnp.ndarray, start: jnp.ndarray, valid: jnp.ndarray):
    """Greedy strongest-|interaction| ordering over a precomputed matrix.

    I is padded to a bucket size; `valid` marks real points. Padded entries
    start visited, and steps where everything is visited are no-ops, so the
    scan length equals the bucket size regardless of the real N. Row
    indexing I[c] relies on the dipole interaction being symmetric."""
    n = I.shape[0]

    def step(carry, _):
        acc, sign, visited = carry
        masked = jnp.where(visited, -jnp.inf, jnp.abs(acc))
        c = jnp.argmax(masked)
        live = ~visited[c]
        s = jnp.where(acc[c] < 0, -1.0, 1.0)
        sign = sign.at[c].set(jnp.where(live, s, sign[c]))
        visited = visited.at[c].set(True)
        acc = acc + jnp.where(live, s, 0.0) * I[c]
        return (acc, sign, visited), None

    acc0 = I[start]
    sign0 = jnp.zeros((n,), jnp.float32).at[start].set(1.0)
    visited0 = (~valid).at[start].set(True)
    (acc, sign, _), _ = jax.lax.scan(step, (acc0, sign0, visited0), None, length=n - 1)
    return acc, sign


def _dipole_column(pts: jnp.ndarray, c, eps) -> jnp.ndarray:
    """I[:, c]: interaction of source point c at every point (fused O(N))."""
    pos, nrm = pts[:, :3], pts[:, 3:6]
    R = pts[c, :3][None, :] - pos                       # (N,3) source - target
    r2 = jnp.sum(R * R, axis=-1)
    zero = r2 == 0.0
    r = jnp.sqrt(r2)
    denom = r * r2 + eps
    p = pts[c, 3:6]
    cdot = R @ p                                        # p . R
    Rn = jnp.sum(R * nrm, axis=-1)
    pn = nrm @ p
    safe_r2 = jnp.where(zero, 1.0, r2)
    col = -(3.0 * cdot * Rn / (safe_r2 * denom) - pn / denom)
    col = jnp.where(zero, 0.0, col)
    return jnp.where(jnp.isfinite(col), col, 0.0)


@jax.jit
def _greedy_scan_onthefly(pts: jnp.ndarray, start: jnp.ndarray, eps: jnp.ndarray,
                          valid: jnp.ndarray):
    n = pts.shape[0]

    def step(carry, _):
        acc, sign, visited = carry
        masked = jnp.where(visited, -jnp.inf, jnp.abs(acc))
        c = jnp.argmax(masked)
        live = ~visited[c]
        s = jnp.where(acc[c] < 0, -1.0, 1.0)
        sign = sign.at[c].set(jnp.where(live, s, sign[c]))
        visited = visited.at[c].set(True)
        acc = acc + jnp.where(live, s, 0.0) * _dipole_column(pts, c, eps)
        return (acc, sign, visited), None

    acc0 = _dipole_column(pts, start, eps)
    sign0 = jnp.zeros((n,), jnp.float32).at[start].set(1.0)
    visited0 = (~valid).at[start].set(True)
    (acc, sign, _), _ = jax.lax.scan(step, (acc0, sign0, visited0), None, length=n - 1)
    return acc, sign


def greedy_sign_sequence(pts, starting_point: int = 0, eps: float = 1e-6,
                         matrix_limit: int | None = None):
    """Run the strongest-field greedy ordering; returns (acc, sign) where
    sign is the +-1 flip state per point and acc the final accumulated
    interaction (E . n_orig). Inputs are padded to power-of-two buckets so
    only a handful of shapes ever compile."""
    pts = np.asarray(pts, dtype=np.float32)
    n = pts.shape[0]
    limit = MATRIX_LIMIT if matrix_limit is None else matrix_limit
    if n <= 1:
        return jnp.zeros((n,), jnp.float32), jnp.ones((n,), jnp.float32)
    nb = _bucket(n)
    valid = jnp.zeros((nb,), bool).at[:n].set(True)
    if n <= limit:
        I = fields.dipole_interaction_matrix(pts, eps=eps)
        Ipad = jnp.zeros((nb, nb), jnp.float32).at[:n, :n].set(I)
        acc, sign = _greedy_scan_matrix(Ipad, jnp.int32(starting_point), valid)
        return acc[:n], sign[:n]
    if fields._pallas_enabled():
        from dipole_tpu.ops import propagate_pallas

        if n <= propagate_pallas.MAX_PALLAS_GREEDY:
            # single-kernel greedy: the whole loop runs in VMEM (~3x the
            # XLA on-the-fly scan at 100k), identical decisions
            return propagate_pallas.greedy_sign_sequence_pallas(
                pts, starting_point, eps
            )
        if n <= propagate_pallas.MAX_PALLAS_STREAMED:
            # beyond VMEM residency: cloud streamed from HBM per step, only
            # accumulator + sign state resident — closes the 262k capacity
            # cliff up to ~1M points on one chip, identical decisions.
            # Crossover vs XL measured r5: warm streamed wins to 1M (44.9 s
            # vs ~53 s) but its compile is far heavier (cold at 1M: 251.8 s
            # vs XL 60.5 s) — the warm/resident serving mode this tier
            # targets amortizes that; one-shot >=1M runs land in XL anyway.
            return propagate_pallas.greedy_sign_sequence_pallas_streamed(
                pts, starting_point, eps
            )
        if n <= propagate_pallas.MAX_PALLAS_XL:
            # past the streamed kernel's VMEM state budget: acc/sign planes
            # HBM-resident too, selection fused into the sweep — single-chip
            # capacity to 2^24 points at ~1.5x the streamed HBM traffic
            return propagate_pallas.greedy_sign_sequence_pallas_xl(
                pts, starting_point, eps
            )
        # The XLA on-the-fly scan below reproducibly kills the TPU worker
        # past ~262k steps (BASELINE.md large-N table), so falling through
        # here would crash the process, not degrade gracefully.
        raise ValueError(
            f"per-point greedy at n={n} exceeds the single-chip XL ceiling "
            f"({propagate_pallas.MAX_PALLAS_XL}); use the "
            "representative-point pipeline (api.orient_large) or the "
            "distributed greedy (parallel.sharding.orient_points_multichip)")
    pad = np.full((nb - n, 6), 0.0, np.float32)
    pad[:, :3] = 1.0e6  # sentinel position, zero moment
    pts_pad = jnp.asarray(np.concatenate([pts, pad], axis=0))
    acc, sign = _greedy_scan_onthefly(
        pts_pad, jnp.int32(starting_point), jnp.float32(eps), valid
    )
    return acc[:n], sign[:n]


@jax.jit
def _greedy_scan_onthefly_vmapped(pts, starts, eps, valid):
    return jax.vmap(
        lambda p, s, v: _greedy_scan_onthefly(p, s, eps, v)
    )(pts, starts, valid)


def greedy_sign_sequence_batched(pts_list, starting_points=None,
                                 eps: float = 1e-6):
    """Run the greedy ordering for SEVERAL independent clouds as one vmapped
    scan — the server's micro-batching core: B concurrent requests cost one
    sequential pass instead of B (each scan step does B masked argmaxes and
    B column evals, all vectorized). Decisions per cloud are exactly the
    single-cloud on-the-fly path's (same kernel, batched carries).

    The batch axis is padded to the next power of two (duplicate lanes,
    sliced off on return) so concurrent serving compiles at most
    log2(max_batch) programs per bucket instead of one per distinct B —
    arrival jitter otherwise makes every wave a fresh multi-second compile.

    Returns a list of (acc, sign) host arrays aligned with pts_list."""
    if not pts_list:
        return []
    pts_list = [np.asarray(p, np.float32) for p in pts_list]
    B = len(pts_list)
    Bp = _pow2(B)
    nb = _bucket(max(len(p) for p in pts_list))
    # The vmapped scan has no Pallas twin; on the TPU backend the XLA
    # on-the-fly scan reproducibly kills the worker at the 262144-step
    # bucket and beyond (BASELINE.md large-N table) — fail fast and point
    # at the per-cloud dispatch, which streams from HBM to ~1M.
    if nb > 131072 and fields._pallas_enabled():
        raise ValueError(
            f"batched greedy bucket {nb} exceeds the safe scan length on "
            "this backend; orient clouds this large one at a time "
            "(greedy_sign_sequence dispatches to the HBM-streamed kernel)")
    pts_pad = np.zeros((Bp, nb, 6), np.float32)
    pts_pad[:, :, :3] = 1.0e6                    # sentinel, zero moment
    valid = np.zeros((Bp, nb), bool)
    for i in range(Bp):
        p = pts_list[min(i, B - 1)]
        pts_pad[i, : len(p)] = p
        valid[i, : len(p)] = True
    if starting_points is None:
        starting_points = [0] * B
    starts = np.asarray(
        list(starting_points) + [starting_points[-1]] * (Bp - B), np.int32)
    acc, sign = _greedy_scan_onthefly_vmapped(
        jnp.asarray(pts_pad), jnp.asarray(starts), jnp.float32(eps),
        jnp.asarray(valid))
    acc = np.asarray(acc)
    sign = np.asarray(sign)
    return [(acc[i, : len(p)], sign[i, : len(p)])
            for i, p in enumerate(pts_list)]


def orient_clouds_batched(pcs, diffuse: bool = False) -> list:
    """Greedy-orient SEVERAL normalized clouds in one vmapped dispatch:
    batched greedy ordering (+ the optional diffuse re-vote) and ONE
    vmapped lattice sign fix. The shared core of serve/batching's
    simple_estimate micro-batch and api.orient_simple_batch. A single
    cloud takes the full serial dispatch (matrix / Pallas resident /
    streamed — faster than the vmapped scan at B=1). Returns new oriented
    arrays, still in normalized space."""
    pcs = [np.asarray(p, np.float32) for p in pcs]
    if not pcs:
        return []
    if len(pcs) == 1:
        acc, sign = greedy_sign_sequence(pcs[0])
        results = [(np.asarray(acc), np.asarray(sign))]
    else:
        results = greedy_sign_sequence_batched(pcs)
    out = []
    for pc, (acc, sign) in zip(pcs, results):
        if diffuse:
            vote = np.where(acc * sign > 0, 1.0, -1.0).astype(np.float32)
            sign = sign * vote
        o = pc.copy()
        o[:, 3:6] *= sign[:, None]
        out.append(o)
    means = fields.measure_mean_potential_batched(out)
    for o, m in zip(out, means):
        if m < 0:
            o[:, 3:6] *= -1
    return out


def strongest_field_propagation_points(pts, diffuse: bool = False,
                                       starting_point: int = 0,
                                       eps: float = 1e-6) -> np.ndarray:
    """Per-point strongest-field propagation (reference
    field_utils.py:353-388, device-agnostic — the fork's forced .cuda() at
    :355 is deliberately not reproduced). Returns a new oriented (N,6)."""
    pts = np.asarray(pts, dtype=np.float32)
    acc, sign = greedy_sign_sequence(pts, starting_point, eps)
    acc = np.asarray(acc)
    sign = np.asarray(sign)
    if diffuse:
        # interactions against current normals: acc_i * sign_i; keep if > 0
        vote = np.where(acc * sign > 0, 1.0, -1.0).astype(np.float32)
        sign = sign * vote
    out = pts.copy()
    out[:, 3:6] *= sign[:, None]
    return out


# ---------------------------------------------------------------------------
# Patch-level greedy propagation
# ---------------------------------------------------------------------------

def _greedy_patch_signs(W: np.ndarray, start: int) -> np.ndarray:
    """Host-side greedy loop over the patch-patch weight matrix (P is small)."""
    P = W.shape[0]
    sign = np.zeros(P, dtype=np.float64)
    visited = np.zeros(P, dtype=bool)
    sign[start] = 1.0
    visited[start] = True
    acc = W[:, start].astype(np.float64).copy()
    for _ in range(P - 1):
        masked = np.where(visited, -np.inf, np.abs(acc))
        c = int(masked.argmax())
        s = -1.0 if acc[c] < 0 else 1.0
        sign[c] = s
        visited[c] = True
        acc += s * W[:, c]
    return sign.astype(np.float32)


def _flattest_patch(pts: np.ndarray, patch_list) -> int:
    """Seed = patch with the smallest |lambda_0| (PCA), reference
    field_utils.py:303-306."""
    e0 = []
    for idx in patch_list:
        x = pts[np.asarray(idx), :3].astype(np.float64)
        x = x - x.mean(axis=0)
        cov = x.T @ x / x.shape[0]
        w = np.linalg.eigvalsh(cov)
        e0.append(abs(w[0]))
    return int(np.argmin(e0))


def _group_interaction(work, seg, P, mesh=None):
    """F[i, q] via the single-device kernel, or target-sharded over a mesh
    (parallel.sharding.point_group_interaction_sharded — same source-block
    scan order, so identical values)."""
    if mesh is not None:
        from dipole_tpu.parallel.sharding import point_group_interaction_sharded

        return jnp.asarray(
            point_group_interaction_sharded(work, seg, P, mesh, eps=1e-5))
    return fields.point_group_interaction(work, seg, P, eps=1e-5)


def strongest_field_propagation_patches(pts, filtered_patches, all_patches,
                                        diffuse: bool = False,
                                        weights=None, mesh=None) -> np.ndarray:
    """Patch-level greedy propagation (reference field_utils.py:286-348).

    pts: (N,6). all_patches: list of index arrays (covers every point).
    filtered_patches: list of (patch_id, index array) — the patches whose
    points get the diffuse per-point re-vote. weights: optional per-point
    confidence in [0,1], clamped to [0.1,1], scales normals during
    propagation (weighted_prop). mesh: optional Mesh — the O(N^2) pair work
    behind F splits over its devices (identical results)."""
    pts = np.asarray(pts, dtype=np.float32)
    n = pts.shape[0]
    P = len(all_patches)
    if P == 0:
        return pts.copy()
    w = None
    if weights is not None:
        w = np.clip(np.asarray(weights, np.float32), 0.1, 1.0)

    seg = np.zeros(n, dtype=np.int32)
    for p, idx in enumerate(all_patches):
        seg[np.asarray(idx)] = p

    work = pts.copy()
    if w is not None:
        work[:, 3:6] *= w[:, None]

    # F[i, q] = interaction at point i from patch q (weighted normals on both
    # sides, like the reference's in-place scaling). F is O(N*P) — it stays
    # on device; only the tiny patch-patch W and the per-point accumulator
    # come back to the host.
    F = _group_interaction(work, seg, P, mesh)
    seg_dev = jnp.asarray(seg)
    W = np.asarray(jax.ops.segment_sum(F, seg_dev, num_segments=P))  # (P,P)

    start = _flattest_patch(pts, all_patches)
    sign = _greedy_patch_signs(W, start)

    total = sign[seg].copy()                             # per-point sign
    if diffuse:
        # accumulated E.n per point; a patch's field never lands on its own
        # points in the reference's diffuse spreading (field_utils.py:326-331),
        # so subtract the own-patch column
        sign_dev = jnp.asarray(sign)
        own = jnp.take_along_axis(F, seg_dev[:, None], axis=1)[:, 0]
        acc = np.asarray(
            jnp.dot(F, sign_dev, precision=_HI) - own * sign_dev[seg_dev]
        )
        for _, idx in filtered_patches:
            idx = np.asarray(idx)
            inter = acc[idx] * total[idx]
            vote = np.where(inter > 0, 1.0, -1.0).astype(np.float32)
            total[idx] = total[idx] * vote

    out = pts.copy()
    out[:, 3:6] *= total[:, None]
    return out


def strongest_field_propagation_reps(pts, reps, diffuse: bool = False,
                                     weights=None, mesh=None) -> np.ndarray:
    """Representative-point propagation for large clouds (reference
    field_utils.py:207-282): the greedy loop runs on <=max_patch_size
    representatives per patch; rest points inherit their patch flip, then are
    individually oriented by the field of all oriented reps. mesh: optional
    Mesh — both the rep-interaction matrix F and the final rest-point field
    pass shard their target rows over the devices."""
    pts = np.asarray(pts, dtype=np.float32)
    n = pts.shape[0]
    P = len(reps)
    if P == 0:
        return pts.copy()
    w = None
    if weights is not None:
        w = np.clip(np.asarray(weights, np.float32), 0.1, 1.0)

    work = pts.copy()
    if w is not None:
        work[:, 3:6] *= w[:, None]

    rep_concat = np.concatenate([np.asarray(r) for r, _ in reps])
    rep_seg = np.concatenate(
        [np.full(len(np.asarray(r)), p, np.int32) for p, (r, _) in enumerate(reps)]
    )
    rep_pts = work[rep_concat]

    F = _group_interaction(rep_pts, rep_seg, P, mesh)
    rep_seg_dev = jnp.asarray(rep_seg)
    W = np.asarray(jax.ops.segment_sum(F, rep_seg_dev, num_segments=P))

    start = _flattest_patch(work, [np.asarray(r) for r, _ in reps])
    sign_patch = _greedy_patch_signs(W, start)

    # per-point total sign: patch sign for reps and rests
    total = np.ones(n, dtype=np.float32)
    for p, (rep, rest) in enumerate(reps):
        total[np.asarray(rep)] = sign_patch[p]
        rest = np.asarray(rest)
        if rest.size:
            total[rest] = sign_patch[p]

    if diffuse:
        # per-rep-point re-vote; own-patch field excluded (the reference's
        # diffuse spread skips the emitting patch, field_utils.py:256-261)
        sp_dev = jnp.asarray(sign_patch)
        own = jnp.take_along_axis(F, rep_seg_dev[:, None], axis=1)[:, 0]
        acc = np.asarray(
            jnp.dot(F, sp_dev, precision=_HI) - own * sp_dev[rep_seg_dev]
        )
        cur = total[rep_concat]
        vote = np.where(acc * cur > 0, 1.0, -1.0).astype(np.float32)
        total[rep_concat] = cur * vote

    # final pass: orient every non-rep point by the field of the (now
    # oriented) reps (reference field_utils.py:273-276)
    rest_concat = np.concatenate(
        [np.asarray(rest) for _, rest in reps if len(np.asarray(rest))]
        or [np.zeros(0, np.int64)]
    ).astype(np.int64)
    if rest_concat.size:
        srcs = work[rep_concat].copy()
        srcs[:, 3:6] *= total[rep_concat][:, None]
        if mesh is not None:
            from dipole_tpu.parallel.sharding import field_grad_sharded

            E = field_grad_sharded(srcs, work[rest_concat, :3], mesh,
                                   shard="targets")
        else:
            E = np.asarray(fields.field_grad(srcs, work[rest_concat, :3]))
        cur_n = work[rest_concat, 3:6] * total[rest_concat][:, None]
        inter = (E * cur_n).sum(-1)
        vote = np.where(inter > 0, 1.0, -1.0).astype(np.float32)
        total[rest_concat] = total[rest_concat] * vote

    out = pts.copy()
    out[:, 3:6] *= total[:, None]
    return out


# ---------------------------------------------------------------------------
# Xie (mirror-field) propagation
# ---------------------------------------------------------------------------

@jax.jit
def _xie_greedy_scan(I: jnp.ndarray, start: jnp.ndarray, valid: jnp.ndarray,
                     knn_idx=None):
    """Sequential xie propagation (reference field_utils.py:536-563).

    The reference re-adds the interaction of the *entire* visited set to the
    unvisited accumulator every iteration, so a source's contribution is
    weighted by how long it has been visited; the next point is the max of
    the *signed* accumulator (not max-|.|). Replicated via a running rate
    vector: rate = I @ (sign * visited); acc += rate each step. I is padded
    to a bucket; padded rows start visited and excess steps are no-ops.

    knn_idx (N, k) int32: optional kNN mask in INDEX form (knn_idx[j] =
    source j's nearest targets; padding rows filled with N, which scatters
    to nothing). Each step applies mask[:, c] = one_hot-scatter(knn_idx[c])
    to the UNMASKED matrix's column on the fly — exact 1.0/0.0 factors, so
    the rate sums are bit-identical to running on a dense-masked matrix —
    instead of materializing the (N, N) mask (VERDICT r3 item 4: the dense
    host mask is 3.6 GB at the server's 30k admission cap)."""
    n = I.shape[0]

    def col(c):
        column = I[:, c]
        if knn_idx is not None:
            column = column * jnp.zeros((n,), jnp.float32).at[knn_idx[c]].set(1.0)
        return column

    def step(carry, _):
        acc, rate, sign, visited = carry
        acc = acc + rate
        masked = jnp.where(visited, -jnp.inf, acc)
        c = jnp.argmax(masked)
        live = ~visited[c]
        s = jnp.where(acc[c] < 0, -1.0, 1.0)
        sign = sign.at[c].set(jnp.where(live, s, sign[c]))
        visited = visited.at[c].set(True)
        rate = rate + jnp.where(live, s, 0.0) * col(c)
        return (acc, rate, sign, visited), None

    acc0 = jnp.zeros((n,), jnp.float32)
    rate0 = col(start)
    sign0 = jnp.zeros((n,), jnp.float32).at[start].set(1.0)
    visited0 = (~valid).at[start].set(True)
    (acc, _, sign, _), _ = jax.lax.scan(
        step, (acc0, rate0, sign0, visited0), None, length=n - 1
    )
    return acc, sign


def xie_propagation_points(pts, eps: float, diffuse: bool = False,
                           starting_point: int = 0, C: float = 3.0,
                           knn_mask: int = -1) -> np.ndarray:
    """Sequential mirror-field propagation (reference field_utils.py:536-563).

    knn_mask > 0 keeps pair (i, j) iff i is among j's knn_mask nearest
    targets (reference field_utils.py:449-458). The mask rides in (N, k)
    INDEX form applied inside the scan / diffuse — no dense (N, N) mask is
    ever built, and the branch holds ONE live bucket-size array (the
    unmasked matrix, built exact-zero-padded at the bucket); decisions are
    bit-identical to dense masking (exact 1.0/0.0 factors; parity test)."""
    pts = np.asarray(pts, dtype=np.float32)
    n = len(pts)
    nb = _bucket(n)
    knn_idx = None
    if knn_mask > 0:
        from dipole_tpu.ops.neighbors import knn

        kk = min(n, knn_mask)
        idxs, _ = knn(pts[:, :3], pts[:, :3], kk)        # (n, kk): j's nearest
        pad = np.full((nb, kk), nb, np.int32)            # fill scatters nowhere
        pad[:n] = np.asarray(idxs)
        knn_idx = jnp.asarray(pad)
    if nb % fields.BLOCK_T == 0 and nb % fields.BLOCK_S == 0:
        # one live (nb, nb) array (exact-zero padded in the kernel) instead
        # of matrix + padded copy — fits 30k-class clouds in HBM
        Ipad = fields.xie_interaction_matrix(pts, C=C, bucket=nb)
    else:
        I = fields.xie_interaction_matrix(pts, C=C)
        Ipad = jnp.zeros((nb, nb), jnp.float32).at[:n, :n].set(I)
        del I
    valid = jnp.zeros((nb,), bool).at[:n].set(True)
    acc, sign_pad = _xie_greedy_scan(Ipad, jnp.int32(starting_point), valid,
                                     knn_idx=knn_idx)
    acc, sign = np.asarray(acc)[:n], np.asarray(sign_pad)[:n]
    if diffuse:
        # reference diffuse_field: interactions of the whole (current) cloud
        # with itself, flip where <= 0 fails; sum over sources incl. self.
        # computed on device — the matrix is O(N^2) and must not ride the
        # host tunnel; padded columns are exactly zero, so the padded dot's
        # first n rows equal the unpadded one
        sp = jnp.zeros((nb,), jnp.float32).at[:n].set(jnp.asarray(sign))
        if knn_idx is None:
            inter = np.asarray(jnp.dot(Ipad, sp, precision=_HI))[:n] * sign
        else:
            inter = np.asarray(
                _masked_diffuse_inter(Ipad, knn_idx, sp))[:n] * sign
        vote = np.where(inter > 0, 1.0, -1.0).astype(np.float32)
        sign = sign * vote
    out = pts.copy()
    out[:, 3:6] *= sign[:, None]
    return out


@jax.jit
def _masked_diffuse_inter(I: jnp.ndarray, knn_idx: jnp.ndarray,
                          sp: jnp.ndarray) -> jnp.ndarray:
    """inter[i] = sum_j I[i, j] * mask[i, j] * sp[j] via the mask's sparsity:
    only (source j, target i in knn_idx[j]) pairs contribute — an O(N k)
    gather + segment-sum, no dense mask (same trick as _in_order_scan's
    masked diffuse). Sentinel rows (fill N) are clipped and zeroed."""
    n = I.shape[0]
    k = knn_idx.shape[1]
    jj = jnp.repeat(jnp.arange(n), k)                    # source index
    mm = knn_idx.reshape(-1)                             # target index
    ok = (mm < n).astype(jnp.float32)
    mmc = jnp.clip(mm, 0, n - 1)
    return jax.ops.segment_sum(I[mmc, jj] * ok * sp[jj], mmc, num_segments=n)


def xie_propagation_points_plus(pts, eps: float, diffuse: bool = False,
                                starting_point: int = 0) -> np.ndarray:
    """Dipole pass then xie pass (reference field_utils.py:532-534)."""
    pts = strongest_field_propagation_points(pts, starting_point=starting_point)
    return xie_propagation_points(pts, eps, diffuse, starting_point=starting_point)


def _build_knn_mask(pts: np.ndarray, k: int) -> np.ndarray:
    """Pair (i, j) kept iff target i is among source j's k nearest targets
    (reference field_utils.py:449-458; square case targets == sources)."""
    from dipole_tpu.ops.neighbors import knn

    n = len(pts)
    k = min(n, k)
    idx, _ = knn(pts[:, :3], pts[:, :3], k)              # idx[j]: j's k nearest
    mask = np.zeros((n, n), dtype=np.float32)
    cols = np.repeat(np.arange(n), k)
    mask[np.asarray(idx).reshape(-1), cols] = 1.0        # rows: targets
    return mask


@partial(jax.jit, static_argnames=("diffuse",))
def _in_order_scan(I: jnp.ndarray, orders: jnp.ndarray, diffuse: bool,
                   knn_idx=None, colw=None):
    """T propagation orders replayed in lock-step (reference
    field_utils.py:569-605). orders: (T, N) int32. Returns flip mask (T, N).

    knn_idx (N, k): optional kNN-mask in INDEX form (knn_idx[j] = source j's
    nearest targets; rows past the real cloud filled with N, which matches
    nothing). The mask factor mask[i, j] = [i in knn_idx[j]] is rebuilt
    per step / per diffuse contribution instead of materializing the dense
    (N, N) mask — keeping the replay at ONE live full-size array.
    colw (N,): optional per-source column scale (points_weight), likewise
    applied on the fly."""
    T, n = orders.shape
    rg = jnp.arange(T)

    def step(carry, idx):
        weights, inter_rec = carry                      # (T,N), (T,N)
        rows = I[idx]                                   # (T,N): I[idx_t, :]
        if knn_idx is not None:
            hit = jnp.any(knn_idx[None, :, :] == idx[:, None, None], axis=-1)
            rows = rows * hit.astype(jnp.float32)
        if colw is not None:
            rows = rows * colw[None, :]
        inter = jnp.einsum("tn,tn->t", rows, weights, precision=_HI)
        w = jnp.where(inter < 0, -1.0, 1.0)
        weights = weights.at[rg, idx].set(w)
        inter_rec = inter_rec.at[rg, idx].set(inter)
        return (weights, inter_rec), None

    weights0 = jnp.zeros((T, n), jnp.float32)
    inter0 = jnp.zeros((T, n), jnp.float32)
    (weights, inter_rec), _ = jax.lax.scan(step, (weights0, inter0), orders.T)
    if diffuse:
        wq = weights if colw is None else weights * colw[None, :]
        if knn_idx is None:
            # contract on I's source axis without materializing I.T (a
            # second full-size copy at 30k-class buckets)
            inter_rec = jax.lax.dot_general(
                wq, I, (((1,), (1,)), ((), ())), precision=_HI)
        else:
            # masked diffuse via the mask's sparsity: only (j, i in knn(j))
            # pairs contribute — an O(N k) gather + segment-sum, no dense
            # mask. Sentinel rows (fill N) are clipped and zeroed.
            k = knn_idx.shape[1]
            jj = jnp.repeat(jnp.arange(n), k)            # source index
            mm = knn_idx.reshape(-1)                     # target index
            ok = (mm < n).astype(jnp.float32)
            mmc = jnp.clip(mm, 0, n - 1)
            Ic = I[mmc, jj] * ok                         # (N*k,)
            contrib = wq[:, jj] * Ic[None, :]            # (T, N*k)
            inter_rec = jax.vmap(
                lambda c: jax.ops.segment_sum(c, mmc, num_segments=n)
            )(contrib)
    return inter_rec < 0


def xie_propagation_in_order(pts, orders, eps: float = 1e-2,
                             diffuse: bool = False, C: float = 3.0,
                             knn_mask: int = -1, points_weight=None,
                             kernel: str = "xie") -> np.ndarray:
    """Order-driven batch replay: T orders advanced in lock-step against one
    interaction matrix. Returns (T, N) bool flip mask.

    kernel="xie" is the fork's mirror field (reference field_utils.py:569-605);
    kernel="dipole" applies the same lock-step machinery to the paper's
    original dipole interaction (an extension — the fork never wired its fast
    replay to the dipole kernel).

    points_weight scales each *source* column of the interaction matrix.
    (The reference declares this parameter but a bug at field_utils.py:576-584
    multiplies by an all-ones vector instead; here the documented intent is
    implemented.)

    Memory: the replay holds ONE live (nb, nb) array in every variant —
    the matrix is built directly at the bucket with exact-zero padding
    (fields.*_interaction_matrix(bucket=...)), the kNN mask is kept in
    (N, k) index form and rebuilt per step, and points_weight is applied
    on the fly — which is what fits 30k-class clouds in one v5e HBM."""
    pts = np.asarray(pts, dtype=np.float32)
    n = len(pts)
    if kernel not in ("xie", "dipole"):
        raise ValueError(f"unknown kernel {kernel!r}")
    # pad to a bucket: the dummy index n has an all-zero row/column, so the
    # padded replay steps neither decide nor contribute anything
    nb = _bucket(n + 1)
    knn_idx_pad = colw = None
    if knn_mask > 0:
        from dipole_tpu.ops.neighbors import knn as _knn

        kk = min(n, knn_mask)
        idxs, _ = _knn(pts[:, :3], pts[:, :3], kk)       # (n, kk): j's nearest
        knn_idx_pad = np.full((nb, kk), nb, np.int32)    # fill matches nothing
        knn_idx_pad[:n] = np.asarray(idxs)
        knn_idx_pad = jnp.asarray(knn_idx_pad)
    if points_weight is not None:
        cw = np.zeros(nb, np.float32)
        cw[:n] = np.asarray(points_weight, np.float32)
        colw = jnp.asarray(cw)
    if nb % fields.BLOCK_T == 0 and nb % fields.BLOCK_S == 0:
        # compute at the bucket directly (exact-zero padding inside the
        # kernel) — no sliced + re-padded copies
        if kernel == "xie":
            Ipad = fields.xie_interaction_matrix(pts, C=C, bucket=nb)
        else:
            Ipad = fields.dipole_interaction_matrix(pts, eps=1e-6, bucket=nb)
    else:
        if kernel == "xie":
            I = fields.xie_interaction_matrix(pts, C=C)
        else:
            I = fields.dipole_interaction_matrix(pts, eps=1e-6)
        Ipad = jnp.zeros((nb, nb), jnp.float32).at[:n, :n].set(I)
    orders = np.asarray(orders, dtype=np.int32)
    opad = np.full((orders.shape[0], nb), n, np.int32)
    opad[:, : orders.shape[1]] = orders
    flips = _in_order_scan(Ipad, jnp.asarray(opad), bool(diffuse),
                           knn_idx=knn_idx_pad, colw=colw)
    return np.asarray(flips)[:, :n]


def xie_propagation_bfs_tree(pts, eps: float, diffuse: bool = False,
                             starting_point: int = 0, k: int = 10,
                             threshold: float = 0.1, times: int = 1,
                             use_pw: bool = False, knn_mask: int = -1,
                             C: float = 3.0, kernel: str = "xie",
                             mesh=None):
    """Multi-start BFS-tree propagation with vote alignment (reference
    field_utils.py:657-710): draw `times` BFS orders from a thresholded kNN
    graph, replay them in lock-step, align runs by solving the binary
    pairwise XOR problem exactly (replacing Gurobi), majority-vote flips.

    mesh: optional jax.sharding.Mesh — the replay then column-shards its
    O(N^2) interaction matrix over the devices
    (parallel.sharding.xie_in_order_sharded), raising the single-chip HBM
    ceiling by ~sqrt(D). Requires knn_mask<=0 and use_pw=False (the masked/
    weighted variants stay single-device).

    Returns (oriented_pts, flip_mask)."""
    if times <= 0 or times % 2 != 1:
        raise ValueError("times must be a positive odd number")

    pts = np.asarray(pts, dtype=np.float32)
    orders, points_weight = bfs_orders(pts, starting_point, k=k,
                                       threshold=threshold, times=times,
                                       use_pw=use_pw)

    if mesh is not None and knn_mask <= 0 and points_weight is None:
        from dipole_tpu.parallel.sharding import xie_in_order_sharded

        flips = xie_in_order_sharded(
            pts, orders, mesh, C=C, eps=eps, diffuse=diffuse, kernel=kernel,
        ).T                                              # (N, T)
    else:
        flips = xie_propagation_in_order(
            pts, orders, eps=eps, diffuse=diffuse, C=C, knn_mask=knn_mask,
            points_weight=points_weight, kernel=kernel,
        ).T                                              # (N, T)

    return align_and_vote(pts, flips)


def bfs_orders(pts, starting_point: int = 0, k: int = 10,
               threshold: float = 0.1, times: int = 1,
               use_pw: bool = False):
    """The host half of the BFS-tree pipeline: thresholded kNN/EMST graph +
    `times` BFS orders from seeded random starts (reference
    field_utils.py:661-687). Returns (orders (T, N), points_weight|None).
    Split out so the server can run it per-request in caller threads while
    micro-batching the replay scans."""
    from dipole_tpu import graphs

    pts = np.asarray(pts, dtype=np.float32)
    n = len(pts)
    # starting point selection mirrors the reference's seeded RNG
    # (field_utils.py:661-666)
    rs = np.random.RandomState(0)
    starting_points = [starting_point]
    while len(np.unique(starting_points)) < times:
        t = rs.randint(0, n)
        if t not in starting_points:
            starting_points.append(t)

    G, mean_k_dist = graphs.emst_from_pc(pts[:, :3], k, threshold)
    points_weight = mean_k_dist if use_pw else None

    orders = np.zeros((times, n), dtype=np.int32)
    for i in range(times):
        orders[i] = G.get_bfs_route(starting_points[i])
    return orders, points_weight


def align_and_vote(pts, flips):
    """Align the T replayed runs (exact binary enumeration of the pairwise
    XOR objective, replacing Gurobi) and majority-vote the flips (reference
    field_utils.py:696-709). flips: (N, T). Returns (oriented, flip_mask)."""
    pts = np.asarray(pts, np.float32)
    n, times = flips.shape
    fl = flips.astype(np.int64)
    disagree = (fl[:, :, None] != fl[:, None, :]).sum(axis=0)  # (T,T)
    A = disagree.astype(np.float64)
    B = (n - disagree).astype(np.float64)
    status = solve.miqp_min(A, B).astype(bool)

    aligned = flips ^ status[None, :]
    cnts = aligned.sum(axis=1)
    flip_mask = cnts > times / 2
    out = pts.copy()
    out[flip_mask, 3:6] *= -1
    return out, flip_mask


@partial(jax.jit, static_argnames=("diffuse",))
def _in_order_scan_vmapped(Is, orders, diffuse: bool):
    return jax.vmap(lambda I, o: _in_order_scan(I, o, diffuse))(Is, orders)


@partial(jax.jit, donate_argnums=0)
def _set_lane(buf, I, i):
    """Write one cloud's matrix into lane i of the stacked batch buffer.
    The donation makes this an in-place update — stacking B matrices never
    holds 2x the batch in HBM (jnp.stack would)."""
    return buf.at[i].set(I)


def xie_in_order_batched(pts_list, orders_list, diffuse: bool = False,
                         C: float = 3.0, kernel: str = "xie") -> list:
    """Replay SEVERAL independent clouds' order sets in one vmapped
    lock-step scan — the server's tree-xie micro-batching core. Each cloud's
    matrix is padded (exact zeros) to the shared bucket; per-cloud dummy
    index n_i keeps padded steps inert exactly as in the single path.
    Returns a list of (T_i, N_i) bool flip masks.

    The batch axis is padded to the next power of two (filler lanes stay
    zero matrices — every step numerically inert, results sliced off) so
    serving compiles at most log2(max_batch) programs per bucket — see
    greedy_sign_sequence_batched.

    Memory: ONE live (pow2(B), nb, nb) buffer plus one (nb, nb) matrix in
    flight — lanes are written via a donated in-place update, never a
    2x-stack. Callers chunk submissions so pow2(B) * nb^2 stays inside the
    HBM budget (serve/batching.py)."""
    if not pts_list:
        return []
    if kernel not in ("xie", "dipole"):
        raise ValueError(f"unknown kernel {kernel!r}")
    nb = max(_bucket(len(p) + 1) for p in pts_list)
    T = orders_list[0].shape[0]
    Bp = _pow2(len(pts_list))
    buf = jnp.zeros((Bp, nb, nb), jnp.float32)
    opads = []
    for i, (p, o) in enumerate(zip(pts_list, orders_list)):
        p = np.asarray(p, np.float32)
        n = len(p)
        if o.shape[0] != T:
            raise ValueError("all order sets must have the same T")
        if nb % fields.BLOCK_T == 0 and nb % fields.BLOCK_S == 0:
            if kernel == "xie":
                Ipad = fields.xie_interaction_matrix(p, C=C, bucket=nb)
            else:
                Ipad = fields.dipole_interaction_matrix(p, eps=1e-6, bucket=nb)
        else:
            I = (fields.xie_interaction_matrix(p, C=C) if kernel == "xie"
                 else fields.dipole_interaction_matrix(p, eps=1e-6))
            Ipad = jnp.zeros((nb, nb), jnp.float32).at[:n, :n].set(I)
        buf = _set_lane(buf, Ipad, i)
        op = np.full((T, nb), n, np.int32)
        op[:, : o.shape[1]] = np.asarray(o, np.int32)
        opads.append(op)
    for _ in range(Bp - len(pts_list)):
        opads.append(np.zeros((T, nb), np.int32))   # zero lanes: all inert
    flips = _in_order_scan_vmapped(buf, jnp.asarray(np.stack(opads)),
                                   bool(diffuse))
    flips = np.asarray(flips)
    return [flips[i][:, : len(p)] for i, p in enumerate(pts_list)]
