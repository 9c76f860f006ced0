"""Multi-chip sharding for the field kernels and model math.

The reference is single-process/single-GPU; its only scale-out is "run more
server processes" (SURVEY §2.2). The TPU-native analog (SURVEY §5.8): a
jax.sharding.Mesh over the chips and SPMD field kernels —

  * target-sharded: each chip holds a shard of the target points and the
    full source set; pair tiles are computed locally, no communication.
    This is the right layout when targets >> sources (lattice sign fix,
    rest-point orientation in orient_large).
  * source-sharded: each chip holds a source shard and all targets; partial
    fields are reduced with a psum over ICI. Right when the source cloud
    exceeds one chip's HBM appetite.
  * ring: each chip holds 1/D of the sources AND 1/D of the targets; the
    source shards rotate around the ring with jax.lax.ppermute, so after D
    steps every target shard has integrated every source — per-chip memory
    is O(N/D) and the compute/communication overlap rides ICI. This is the
    layout that makes multi-chip buy *capacity*, not just compute (SURVEY
    §5.8: ring rotation replaces the reference's recursive break_by_sources
    at field_utils.py:23-44 when the cloud exceeds one chip's HBM).

The first two compose: shard targets on one mesh axis and sources on
another for a 2D decomposition with a single psum along the source axis.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from dipole_tpu.ops import fields

__all__ = ["make_mesh", "field_grad_sharded", "potential_sharded",
           "interaction_accumulate_sharded", "pad_cloud_for_ring",
           "greedy_sign_sequence_sharded", "orient_points_multichip",
           "xie_in_order_sharded", "point_group_interaction_sharded"]


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if n > len(devs):
        raise ValueError(
            f"requested a {n}-device mesh but only {len(devs)} device(s) "
            "are available (silently shrinking would fake the validation)")
    return Mesh(np.array(devs[:n]), (axis,))


def _pad_to(x: np.ndarray, mult: int, fill: float) -> np.ndarray:
    rem = (-len(x)) % mult
    if rem == 0:
        return x
    pad = np.full((rem,) + x.shape[1:], fill, dtype=x.dtype)
    return np.concatenate([x, pad], axis=0)


def field_grad_sharded(sources, targets, mesh: Mesh, eps: float = 1e-5,
                       shard: str = "targets") -> np.ndarray:
    """Dipole field with the pair space sharded over the mesh.

    shard="targets": each device computes its target shard from the full
    source set (no collectives). shard="sources": each device owns a source
    shard; partial fields are psum-reduced over ICI."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    src = np.asarray(sources, np.float32)
    tgt = np.asarray(targets, np.float32)[:, :3]
    n_t = len(tgt)

    if shard == "targets":
        tgt_p = _pad_to(tgt, n_dev * fields.BLOCK_T, fields._SENTINEL)

        @partial(
            jax.shard_map, mesh=mesh, check_vma=False,
            in_specs=(P(), P(axis, None), P()),
            out_specs=P(axis, None),
        )
        def run(src_rep, tgt_shard, eps_):
            return fields._field_grad_padded(src_rep, tgt_shard, eps_)

        src_p = np.asarray(fields._prep_sources(src))
        out = run(src_p, tgt_p, jnp.float32(eps))
        return np.asarray(out)[:n_t]

    if shard == "sources":
        # pad sources so each shard is a whole number of source blocks
        src_p = _pad_to(src, n_dev * fields.BLOCK_S, 0.0)
        src_p[len(src):, :3] = fields._SENTINEL
        src_p[len(src):, 3:] = 0.0
        tgt_p = _pad_to(tgt, fields.BLOCK_T, fields._SENTINEL)

        @partial(
            jax.shard_map, mesh=mesh, check_vma=False,
            in_specs=(P(axis, None), P(), P()),
            out_specs=P(),
        )
        def run(src_shard, tgt_rep, eps_):
            partial_E = fields._field_grad_padded(src_shard, tgt_rep, eps_)
            return jax.lax.psum(partial_E, axis)

        out = run(src_p, tgt_p, jnp.float32(eps))
        return np.asarray(out)[:n_t]

    if shard == "ring":
        src_p = pad_cloud_for_ring(src, n_dev, fields.BLOCK_S)
        tgt_p = _pad_to(tgt, n_dev * fields.BLOCK_T, fields._SENTINEL)
        out = _ring_field(mesh)(src_p, tgt_p, jnp.float32(eps))
        return np.asarray(out)[:n_t]

    raise ValueError(f"unknown shard mode {shard!r}")


def pad_cloud_for_ring(pts: np.ndarray, n_dev: int, block: int) -> np.ndarray:
    """Pad an (N, 6) cloud so each of n_dev shards is a whole number of
    kernel blocks; padding rows are sentinel-position / zero-moment so they
    contribute exactly nothing."""
    pts = np.asarray(pts, np.float32)
    n = len(pts)
    out = _pad_to(pts, n_dev * block, 0.0)
    out[n:, :3] = fields._SENTINEL
    out[n:, 3:] = 0.0
    return out


def _ring_field(mesh: Mesh, eps_kind: str = "field"):
    """shard_map'd ring kernel: sources AND targets both sharded over the
    mesh axis; source shards rotate over ICI (ppermute) until every target
    shard has integrated every source. Per-device memory is O(N/D).

    Operates on pre-padded arrays (rows a multiple of n_dev * BLOCK); the
    output stays sharded like the targets, so callers composing further
    sharded steps never gather to one chip.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]

    @partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(axis, None), P(axis, None), P()),
        out_specs=P(axis, None),
    )
    def run(src_shard, tgt_shard, eps_):
        def body(i, carry):
            E, src_cur = carry
            E = E + fields._field_grad_padded(src_cur, tgt_shard, eps_)
            src_cur = jax.lax.ppermute(src_cur, axis, perm)
            return (E, src_cur)

        E0 = jnp.zeros((tgt_shard.shape[0], 3), jnp.float32)
        E, _ = jax.lax.fori_loop(0, n_dev, body, (E0, src_shard))
        return E

    return run


def potential_sharded(sources, targets, mesh: Mesh,
                      shard: str = "sources") -> np.ndarray:
    """Lattice potential at multi-chip scale (the global sign fix).

    shard="sources": source shards + replicated targets + psum — right when
    the target lattice is tiny (the 10^3 sign-fix grid). shard="ring":
    sources and targets both sharded, source shards rotate over ICI — right
    when targets are also a big cloud."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    src = np.asarray(sources, np.float32)
    tgt = np.asarray(targets, np.float32)[:, :3]
    n_t = len(tgt)
    src_p = pad_cloud_for_ring(src, n_dev, fields.BLOCK_S)

    if shard == "ring":
        tgt_p = _pad_to(tgt, n_dev * fields.BLOCK_T, fields._SENTINEL)
        perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]

        @partial(
            jax.shard_map, mesh=mesh, check_vma=False,
            in_specs=(P(axis, None), P(axis, None)),
            out_specs=P(axis),
        )
        def run_ring(src_shard, tgt_shard):
            def body(i, carry):
                phi, src_cur = carry
                phi = phi + fields._potential_padded(src_cur, tgt_shard)
                src_cur = jax.lax.ppermute(src_cur, axis, perm)
                return (phi, src_cur)

            phi0 = jnp.zeros((tgt_shard.shape[0],), jnp.float32)
            phi, _ = jax.lax.fori_loop(0, n_dev, body, (phi0, src_shard))
            return phi

        return np.asarray(run_ring(src_p, tgt_p))[:n_t]

    tgt_p = _pad_to(tgt, fields.BLOCK_T, fields._SENTINEL)

    @partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(axis, None), P()),
        out_specs=P(),
    )
    def run(src_shard, tgt_rep):
        return jax.lax.psum(fields._potential_padded(src_shard, tgt_rep), axis)

    return np.asarray(run(src_p, tgt_p))[:n_t]


def interaction_accumulate_sharded(pts, signs, mesh: Mesh, eps: float = 1e-5,
                                    shard: str = "ring"):
    """acc_i = sum_j sign_j * I_ij with the cloud sharded over the mesh —
    the distributed building block for diffuse re-votes on clouds that
    exceed one chip. shard="ring" (default) keeps per-chip memory at
    O(N/D): both the signed sources and the targets are sharded and source
    shards rotate over ICI. shard="sources" replicates the targets and
    psum-reduces the partial fields."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    pts = np.asarray(pts, np.float32)
    n = len(pts)
    signed = pts.copy()
    signed[:, 3:6] *= np.asarray(signs, np.float32)[:, None]
    src_p = pad_cloud_for_ring(signed, n_dev, fields.BLOCK_S)

    if shard == "ring":
        tgt_p = _pad_to(pts[:, :3], n_dev * fields.BLOCK_T, fields._SENTINEL)
        E = np.asarray(_ring_field(mesh)(src_p, tgt_p, jnp.float32(eps)))[:n]
        return (E * pts[:, 3:6]).sum(-1)

    tgt_p = _pad_to(pts, fields.BLOCK_T, fields._SENTINEL)

    @partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(axis, None), P(), P()),
        out_specs=P(),
    )
    def run(src_shard, tgt_rep, eps_):
        E = fields._field_grad_padded(src_shard, tgt_rep[:, :3], eps_)
        return jax.lax.psum(E, axis)

    E = np.asarray(run(src_p, tgt_p, jnp.float32(eps)))[:n]
    return (E * pts[:, 3:6]).sum(-1)


def point_group_interaction_sharded(pts, group_ids, num_groups: int,
                                    mesh: Mesh, eps: float = 1e-5,
                                    source_weights=None) -> np.ndarray:
    """F[i, g] = sum over sources j in group g of I[i, j], with the TARGET
    rows sharded over the mesh — the multi-chip core of patch propagation
    (C8/C9): each chip streams the full source set against its own target
    shard, so the O(N * N) pair work splits D ways with zero collectives.

    The per-target source-block scan order is identical to the single-device
    fields.point_group_interaction, so results match it exactly (same
    summation order; only the rows live on different chips)."""
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    pts = jnp.asarray(pts, jnp.float32)
    if source_weights is not None:
        w = jnp.asarray(source_weights, jnp.float32)
        pts = pts.at[:, 3:6].multiply(w[:, None])
    n = pts.shape[0]
    src = np.asarray(fields._prep_sources(pts))
    padded_groups = -(-num_groups // 128) * 128
    onehot = jax.nn.one_hot(jnp.asarray(group_ids), padded_groups,
                            dtype=jnp.float32)
    onehot = np.asarray(fields._pad_rows(onehot, fields.BLOCK_S, 0.0))
    tgt = _pad_to(np.asarray(pts), n_dev * fields.BLOCK_T, fields._SENTINEL)

    @partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(axis, None), P(), P(), P()),
        out_specs=P(axis, None),
    )
    def run(tgt_shard, src_rep, oh_rep, eps_):
        return fields._group_interaction_padded(tgt_shard, src_rep, oh_rep, eps_)

    F = run(tgt, src, onehot, jnp.float32(eps))
    return np.asarray(F)[:n, :num_groups]


def greedy_sign_sequence_sharded(pts, mesh: Mesh, starting_point: int = 0,
                                 eps: float = 1e-6):
    """Distributed strongest-field greedy propagation: the interaction
    accumulator is sharded over the mesh (each chip owns a target shard and
    evaluates the chosen point's field column locally); the global argmax is
    agreed per step with a single psum over (masked-max value, index) pairs.

    This is the multi-chip form of ops/propagate.greedy_sign_sequence for
    clouds whose O(N) per-step state / O(N^2) work exceeds one chip — the
    sequential decision chain is preserved exactly (same flips as the
    single-device scan). Returns (acc, sign) on the host.

    Memory: every array is sharded — each chip holds N/D rows of the cloud
    and its accumulator shard. Nothing is replicated; the chosen point's
    (6,) row is broadcast from its owner with one psum per step.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    pts = np.asarray(pts, np.float32)
    n = len(pts)
    shard = -(-n // (n_dev * 8)) * 8                      # rows per device, 8-aligned
    nb = shard * n_dev
    pts_pad = np.zeros((nb, 6), np.float32)
    pts_pad[:n] = pts
    pts_pad[n:, :3] = 1.0e6                               # sentinel, zero moment
    valid = np.zeros(nb, bool)
    valid[:n] = True

    @partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(axis, None), P(axis), P()),
        out_specs=(P(axis), P(axis)),
    )
    def run(pts_shard, valid_shard, start):
        m = pts_shard.shape[0]
        me = jax.lax.axis_index(axis)
        base = me * m                                     # my global row offset
        pos, nrm = pts_shard[:, :3], pts_shard[:, 3:6]

        def fetch_row(c):
            """Owner of global row c broadcasts its (6,) point via psum."""
            local = (c >= base) & (c < base + m)
            lc = jnp.clip(c - base, 0, m - 1)
            row = jnp.where(local, pts_shard[lc], jnp.zeros((6,), jnp.float32))
            return jax.lax.psum(row, axis)

        def column(src):
            """Interaction of source point src (6,) at my target shard."""
            R = src[:3][None, :] - pos
            r2 = jnp.sum(R * R, axis=-1)
            zero = r2 == 0.0
            r = jnp.sqrt(r2)
            denom = r * r2 + eps
            p = src[3:6]
            cdot = R @ p
            Rn = jnp.sum(R * nrm, axis=-1)
            pn = nrm @ p
            safe_r2 = jnp.where(zero, 1.0, r2)
            col = -(3.0 * cdot * Rn / (safe_r2 * denom) - pn / denom)
            col = jnp.where(zero, 0.0, col)
            return jnp.where(jnp.isfinite(col), col, 0.0)

        def global_argmax(masked):
            """argmax over the sharded vector: local argmax, then a psum of
            one-hot (value, index) encodings picks the winner (ties resolve
            to the lowest global index, matching the single-device argmax)."""
            li = jnp.argmax(masked)
            lv = masked[li]
            gi = base + li
            # gather every shard's candidate (value, index)
            vals = jax.lax.all_gather(lv, axis)           # (n_dev,)
            idxs = jax.lax.all_gather(gi, axis)
            best_shard = jnp.argmax(vals)
            # lowest-index tie-break across shards
            is_max = vals == vals[best_shard]
            cand = jnp.where(is_max, idxs, jnp.iinfo(jnp.int32).max)
            return jnp.min(cand), vals[best_shard]

        def step(carry, _):
            acc, sign, visited = carry
            masked = jnp.where(visited, -jnp.inf, jnp.abs(acc))
            c, _ = global_argmax(masked)
            # the owning shard reads acc[c]; broadcast via psum
            local = (c >= base) & (c < base + m)
            acc_c = jax.lax.psum(
                jnp.where(local, acc[jnp.clip(c - base, 0, m - 1)], 0.0), axis
            )
            was_visited = jax.lax.psum(
                jnp.where(local,
                          visited[jnp.clip(c - base, 0, m - 1)].astype(jnp.float32),
                          0.0), axis) > 0
            s = jnp.where(acc_c < 0, -1.0, 1.0)
            upd = jnp.where(was_visited, 0.0, s)
            lc = jnp.clip(c - base, 0, m - 1)
            sign = jnp.where(local, sign.at[lc].set(jnp.where(was_visited, sign[lc], s)), sign)
            visited = jnp.where(local, visited.at[lc].set(True), visited)
            acc = acc + upd * column(fetch_row(c))
            return (acc, sign, visited), None

        start_local = (start >= base) & (start < base + m)
        sl = jnp.clip(start - base, 0, m - 1)
        acc0 = column(fetch_row(start))
        sign0 = jnp.where(start_local,
                          jnp.zeros((m,), jnp.float32).at[sl].set(1.0),
                          jnp.zeros((m,), jnp.float32))
        visited0 = ~valid_shard
        visited0 = jnp.where(start_local, visited0.at[sl].set(True), visited0)
        (acc, sign, _), _ = jax.lax.scan(
            step, (acc0, sign0, visited0), None, length=nb - 1
        )
        return acc, sign

    acc, sign = run(pts_pad, valid, jnp.int32(starting_point))
    return np.asarray(acc)[:n], np.asarray(sign)[:n]


def orient_points_multichip(pts, mesh: Mesh, diffuse: bool = True,
                            starting_point: int = 0, eps: float = 1e-6) -> np.ndarray:
    """One-call multi-chip orient_simple core: distributed greedy propagation
    + (optional) diffuse re-vote + source-sharded lattice sign fix. The
    single-chip pipeline for clouds that exceed one chip's memory/compute.

    Identical decisions to ops/propagate.strongest_field_propagation_points
    followed by the measure_mean_potential sign fix."""
    from dipole_tpu.utils.io import gen_grid

    pts = np.asarray(pts, np.float32)
    acc, sign = greedy_sign_sequence_sharded(pts, mesh, starting_point, eps)
    if diffuse:
        vote = np.where(acc * sign > 0, 1.0, -1.0).astype(np.float32)
        sign = sign * vote
    out = pts.copy()
    out[:, 3:6] *= sign[:, None]
    phi = potential_sharded(out, gen_grid(10), mesh)
    if phi.mean() < 0:
        out[:, 3:6] *= -1
    return out


def xie_in_order_sharded(pts, orders, mesh: Mesh, C: float = 3.0,
                         eps: float = 1e-6, diffuse: bool = False,
                         kernel: str = "xie") -> np.ndarray:
    """Multi-chip order-driven batch replay (the fork's centerpiece C12,
    reference field_utils.py:569-605): the O(N^2) interaction matrix is
    COLUMN-sharded over the mesh — each chip builds and holds only the
    (N, N/D) block for its own source columns, so the quadratic object
    scales past one chip's HBM (8 chips raise the 30k single-chip ceiling
    to ~90k). The lock-step scan stays sequential-exact: each step reduces
    a (T,)-sized partial interaction with one psum over ICI; weight updates
    land on the owning column shard only.

    Returns the (T, N) bool flip mask, matching
    ops/propagate.xie_propagation_in_order. Caveat: the per-step sum is
    associated per-shard then psum-reduced — a different float summation
    order than the single-device full-row einsum, so a near-zero interaction
    can flip a sign decision and cascade. Agreement is exact on the 8-way
    CPU test mesh but is not bit-guaranteed across device counts/hardware;
    treat cross-path comparisons as agreement-rate, not equality.
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    pts = np.asarray(pts, np.float32)
    n = len(pts)
    blk = max(fields.BLOCK_T, fields.BLOCK_S)
    shard = -(-max(n + 1, 1) // (n_dev * blk)) * blk      # cols per device
    nb = shard * n_dev
    pts_pad = np.zeros((nb, 6), np.float32)
    pts_pad[:n] = pts
    pts_pad[n:, :3] = fields._SENTINEL                    # zero moment/normal
    orders = np.asarray(orders, dtype=np.int32)
    T = orders.shape[0]
    # scan length: the single-device replay's bucket, NOT nb (which is
    # block-aligned per device and can be far larger for small clouds —
    # every extra step would be a wasted sequential psum over ICI)
    from dipole_tpu.ops.propagate import _bucket

    L = max(_bucket(n + 1), orders.shape[1])
    opad = np.full((T, L), n, np.int32)                   # dummy index: row n
    opad[:, : orders.shape[1]] = orders
    if kernel == "xie":
        tile, arg = fields._xie_interaction_tile, jnp.float32(C)
    elif kernel == "dipole":
        # match the single-device replay exactly: it builds the dipole
        # matrix with eps=1e-6 regardless of the propagation eps
        tile, arg = fields._dipole_interaction_tile, jnp.float32(1e-6)
    else:
        raise ValueError(f"unknown kernel {kernel!r}")
    rg = jnp.arange(T)

    @partial(
        jax.shard_map, mesh=mesh, check_vma=False,
        in_specs=(P(), P(), P()),
        out_specs=P(None, axis),
    )
    def run(pts_rep, opad_rep, tile_arg):
        me = jax.lax.axis_index(axis)
        base = me * shard
        src = jax.lax.dynamic_slice_in_dim(pts_rep, base, shard, axis=0)
        Iloc = fields._matrix_blocked(tile, pts_rep, src, tile_arg)  # (nb, shard)

        def step(carry, idx):                             # idx: (T,)
            w, rec = carry                                # (T, shard) each
            rows = Iloc[idx]                              # (T, shard)
            inter = jax.lax.psum(
                jnp.einsum("ts,ts->t", rows, w,
                           precision=jax.lax.Precision.HIGHEST), axis)
            s = jnp.where(inter < 0, -1.0, 1.0)
            local = (idx >= base) & (idx < base + shard)
            li = jnp.clip(idx - base, 0, shard - 1)
            w = w.at[rg, li].set(jnp.where(local, s, w[rg, li]))
            rec = rec.at[rg, li].set(jnp.where(local, inter, rec[rg, li]))
            return (w, rec), None

        w0 = jnp.zeros((T, shard), jnp.float32)
        (w, rec), _ = jax.lax.scan(step, (w0, w0), opad_rep.T)
        if diffuse:
            # rec[t, m] = sum_n w[t, n] I[m, n]: partial over my columns,
            # then one psum; keep my row-aligned column slice for output
            part = jax.lax.dot_general(
                w, Iloc, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST)      # (T, nb)
            full = jax.lax.psum(part, axis)
            rec = jax.lax.dynamic_slice_in_dim(full, base, shard, axis=1)
        return rec < 0

    flips = run(jnp.asarray(pts_pad), jnp.asarray(opad), arg)
    return np.asarray(flips)[:, :n]
