"""Multi-device sharding tests on the 8-device virtual CPU mesh."""
import jax
import numpy as np
import pytest

from dipole_tpu.ops import fields
from dipole_tpu.parallel import sharding
from tests.conftest import make_sphere


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    return sharding.make_mesh(8)


def test_field_target_sharded_matches_single(mesh):
    src = make_sphere(300, seed=0)
    tgt = make_sphere(500, seed=1)
    single = np.asarray(fields.field_grad(src, tgt))
    multi = sharding.field_grad_sharded(src, tgt, mesh, shard="targets")
    np.testing.assert_allclose(multi, single, rtol=1e-4, atol=1e-5)


def test_field_source_sharded_matches_single(mesh):
    src = make_sphere(700, seed=2)
    tgt = make_sphere(200, seed=3)
    single = np.asarray(fields.field_grad(src, tgt))
    multi = sharding.field_grad_sharded(src, tgt, mesh, shard="sources")
    np.testing.assert_allclose(multi, single, rtol=1e-4, atol=1e-5)


def test_potential_sharded_matches_single(mesh):
    from dipole_tpu.utils.io import gen_grid

    src = make_sphere(400, seed=4) * 0.4
    grid = gen_grid(10)
    single = np.asarray(fields.potential(src, grid))
    multi = sharding.potential_sharded(src, grid, mesh)
    np.testing.assert_allclose(multi, single, rtol=1e-3, atol=1e-4)


def test_field_ring_sharded_matches_single(mesh):
    src = make_sphere(700, seed=7)
    tgt = make_sphere(500, seed=8)
    single = np.asarray(fields.field_grad(src, tgt))
    multi = sharding.field_grad_sharded(src, tgt, mesh, shard="ring")
    np.testing.assert_allclose(multi, single, rtol=1e-4, atol=1e-5)


def test_potential_ring_sharded_matches_single(mesh):
    src = make_sphere(400, seed=9) * 0.4
    tgt = make_sphere(600, seed=10)
    single = np.asarray(fields.potential(src, tgt))
    multi = sharding.potential_sharded(src, tgt, mesh, shard="ring")
    np.testing.assert_allclose(multi, single, rtol=1e-3, atol=1e-4)


def test_ring_per_device_memory_is_one_over_d(mesh):
    """The ring layout must hold only ~1/D of the cloud per chip: inputs are
    sharded on the mesh axis, the ring kernel accepts them pre-sharded (no
    host gather), and the output stays sharded the same way."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_dev = 8
    pts = make_sphere(n_dev * fields.BLOCK_S, seed=11)
    src_p = sharding.pad_cloud_for_ring(pts, n_dev, fields.BLOCK_S)
    tgt_p = np.ascontiguousarray(src_p[:, :3])
    spec = NamedSharding(mesh, P("data", None))
    src_d = jax.device_put(src_p, spec)
    tgt_d = jax.device_put(tgt_p, spec)
    for arr in (src_d, tgt_d):
        assert len(arr.addressable_shards) == n_dev
        assert arr.addressable_shards[0].data.nbytes * n_dev == arr.nbytes

    out = sharding._ring_field(mesh)(src_d, tgt_d, jnp.float32(1e-5))
    assert len(out.addressable_shards) == n_dev
    assert out.addressable_shards[0].data.nbytes * n_dev == out.nbytes

    # spot-check correctness on a slice against the dense kernel
    want = np.asarray(fields.field_grad(pts, pts[:128, :3]))
    np.testing.assert_allclose(np.asarray(out)[:128], want, rtol=1e-3, atol=1e-4)


def test_interaction_accumulate_ring_matches_sources(mesh):
    pts = make_sphere(300, seed=12)
    signs = np.where(np.random.default_rng(13).random(300) < 0.5, -1.0, 1.0)
    ring = sharding.interaction_accumulate_sharded(pts, signs, mesh, shard="ring")
    srcs = sharding.interaction_accumulate_sharded(pts, signs, mesh, shard="sources")
    np.testing.assert_allclose(ring, srcs, rtol=1e-3, atol=1e-3)


def test_interaction_accumulate_sharded(mesh):
    pts = make_sphere(300, seed=5)
    signs = np.where(np.random.default_rng(6).random(300) < 0.5, -1.0, 1.0)
    acc = sharding.interaction_accumulate_sharded(pts, signs, mesh)
    I = np.asarray(fields.dipole_interaction_matrix(pts, eps=1e-5))
    want = I @ signs
    scale = np.abs(I).sum(-1)
    assert np.all(np.abs(acc - want) <= 1e-2 * np.abs(want) + 1e-3 * scale + 1e-3)


def test_sharded_greedy_matches_single(mesh):
    from dipole_tpu.ops import propagate
    from tests.conftest import scramble_signs

    gt = make_sphere(500, seed=20)
    pc, _ = scramble_signs(gt, seed=21)
    acc_m, sign_m = sharding.greedy_sign_sequence_sharded(pc, mesh)
    acc_s, sign_s = propagate.greedy_sign_sequence(pc)
    assert (np.asarray(sign_s) == sign_m).mean() == 1.0
    assert np.allclose(acc_m, np.asarray(acc_s), rtol=1e-3, atol=1e-3)


def test_orient_points_multichip_matches_single(mesh):
    from dipole_tpu.ops import fields, propagate
    from tests.conftest import scramble_signs

    gt = make_sphere(400, seed=22)
    pc, _ = scramble_signs(gt, seed=23)
    multi = sharding.orient_points_multichip(pc, mesh, diffuse=True)
    single = propagate.strongest_field_propagation_points(pc, diffuse=True)
    if fields.measure_mean_potential(single) < 0:
        single[:, 3:6] *= -1
    agree = ((multi[:, 3:] * single[:, 3:]).sum(1) > 0).mean()
    assert agree == 1.0


def test_dryrun_multichip_from_initialized_process():
    """The driver calls dryrun_multichip from a process whose jax already
    initialized a backend (on the real driver: the TPU plugin). The function
    must detect this and re-exec in a clean forced-CPU subprocess instead of
    dispatching on the live backend — this test runs it exactly that way."""
    import jax

    import __graft_entry__ as g

    jax.devices()  # ensure a backend exists even when this test runs alone
    assert g._jax_touched()
    g.dryrun_multichip(8)


def test_xie_in_order_sharded_matches_single(mesh):
    """Column-sharded C12 replay: same flip decisions as the single-device
    lock-step scan, per-device matrix block = N^2/D entries by construction."""
    from dipole_tpu.ops import propagate
    from dipole_tpu.parallel.sharding import xie_in_order_sharded

    rng = np.random.default_rng(31)
    pc = rng.normal(size=(300, 6)).astype(np.float32)
    pc[:, 3:] /= np.linalg.norm(pc[:, 3:], axis=1, keepdims=True)
    orders = np.stack([rng.permutation(300) for _ in range(3)])
    for kernel in ("xie", "dipole"):
        for diffuse in (False, True):
            single = propagate.xie_propagation_in_order(
                pc, orders, diffuse=diffuse, kernel=kernel)
            multi = xie_in_order_sharded(
                pc, orders, mesh, diffuse=diffuse, kernel=kernel)
            assert multi.shape == single.shape
            agree = (multi == single).mean()
            # per-shard-then-psum is a different float summation order than
            # the single-device full-row einsum, so exact equality is not
            # bit-guaranteed across device counts/hardware; require
            # agreement-rate (observed 1.0 on the 8-way CPU mesh)
            assert agree >= 0.99, (kernel, diffuse, agree)
    # the propagation eps must NOT leak into the dipole matrix (the
    # single-device replay pins its matrix eps at 1e-6 regardless)
    single = propagate.xie_propagation_in_order(pc, orders, kernel="dipole",
                                                eps=0.01)
    multi = xie_in_order_sharded(pc, orders, mesh, kernel="dipole", eps=0.01)
    assert (multi == single).mean() >= 0.99
    with pytest.raises(ValueError):
        xie_in_order_sharded(pc, orders, mesh, kernel="typo")


def test_bfs_tree_mesh_matches_single(mesh):
    """tree-xie (C13) with mesh=: same oriented output as single-device."""
    from dipole_tpu.ops import propagate

    pc = make_sphere(260, seed=33)
    single, _ = propagate.xie_propagation_bfs_tree(
        pc, eps=0.01, times=3, diffuse=True)
    multi, _ = propagate.xie_propagation_bfs_tree(
        pc, eps=0.01, times=3, diffuse=True, mesh=mesh)
    assert (multi == single).all()


def test_point_group_interaction_sharded_matches_single(mesh):
    """Target-sharded F (the patch-pipeline core): identical to the
    single-device kernel (same source-block scan order per row)."""
    rng = np.random.default_rng(40)
    pc = make_sphere(700, seed=40)
    seg = rng.integers(0, 9, size=len(pc)).astype(np.int32)
    single = np.asarray(fields.point_group_interaction(pc, seg, 9, eps=1e-5))
    multi = sharding.point_group_interaction_sharded(pc, seg, 9, mesh, eps=1e-5)
    assert multi.shape == single.shape
    np.testing.assert_array_equal(multi, single)
    # weighted variant
    w = rng.uniform(0.1, 1.0, size=len(pc)).astype(np.float32)
    single_w = np.asarray(
        fields.point_group_interaction(pc, seg, 9, eps=1e-5, source_weights=w))
    multi_w = sharding.point_group_interaction_sharded(
        pc, seg, 9, mesh, eps=1e-5, source_weights=w)
    np.testing.assert_array_equal(multi_w, single_w)


def test_patch_propagation_mesh_matches_single(mesh):
    """strongest_field_propagation_patches / _reps with mesh=: identical
    oriented output (the multi-chip patch pipeline, VERDICT r2 item 1)."""
    from dipole_tpu.ops import propagate

    rng = np.random.default_rng(41)
    pc = make_sphere(600, seed=41)
    scram = rng.random(len(pc)) < 0.5
    pc[scram, 3:] *= -1
    order = rng.permutation(len(pc))
    all_patches = [np.sort(order[i::6]) for i in range(6)]
    filtered = [(i, p) for i, p in enumerate(all_patches)]
    w = rng.uniform(0.2, 1.0, size=len(pc)).astype(np.float32)
    for diffuse in (False, True):
        single = propagate.strongest_field_propagation_patches(
            pc, filtered, all_patches, diffuse=diffuse, weights=w)
        multi = propagate.strongest_field_propagation_patches(
            pc, filtered, all_patches, diffuse=diffuse, weights=w, mesh=mesh)
        np.testing.assert_array_equal(multi, single)
    reps = []
    for p in all_patches:
        perm = rng.permutation(len(p))
        reps.append((p[perm[:60]], p[perm[60:]]))
    single = propagate.strongest_field_propagation_reps(pc, reps, diffuse=True)
    multi = propagate.strongest_field_propagation_reps(pc, reps, diffuse=True,
                                                       mesh=mesh)
    sign_agree = ((single[:, 3:] * multi[:, 3:]).sum(1) > 0).mean()
    assert sign_agree == 1.0, sign_agree


def test_ensemble_forward_mesh_matches_single(mesh):
    """pointcnn_logits_batched with the batch axis sharded over the mesh:
    per-patch logits match the single-device vmap (patches independent)."""
    from dipole_tpu import train
    from dipole_tpu.models.pointcnn import pointcnn_logits_batched

    params = train.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(42)
    patches = []
    for i in range(10):
        p = rng.normal(size=(rng.integers(40, 120), 6)).astype(np.float32)
        p[:, 3:] /= np.linalg.norm(p[:, 3:], axis=1, keepdims=True)
        patches.append(p)
    key = jax.random.PRNGKey(5)
    single = pointcnn_logits_batched(params, 0.6, patches, key=key)
    multi = pointcnn_logits_batched(params, 0.6, patches, key=key, mesh=mesh)
    for s, m in zip(single, multi):
        np.testing.assert_allclose(m, s, rtol=2e-4, atol=2e-5)


def test_ensemble_starts_forward_mesh_matches_single(mesh):
    """The explicit-starts forward (fps_starts='centroid') sharded over the
    mesh matches the single-device starts path per patch."""
    from dipole_tpu import train
    from dipole_tpu.models.pointcnn import (centroid_starts,
                                            pointcnn_logits_batched)

    params = train.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(43)
    patches = []
    for i in range(10):
        p = rng.normal(size=(rng.integers(40, 120), 6)).astype(np.float32)
        p[:, 3:] /= np.linalg.norm(p[:, 3:], axis=1, keepdims=True)
        patches.append(p)
    st = centroid_starts(patches)
    single = pointcnn_logits_batched(params, 0.6, patches, starts=st)
    multi = pointcnn_logits_batched(params, 0.6, patches, starts=st,
                                    mesh=mesh)
    for s, m in zip(single, multi):
        np.testing.assert_allclose(m, s, rtol=2e-4, atol=2e-5)


def test_resolve_mesh():
    from dipole_tpu.api import resolve_mesh

    assert resolve_mesh(None) is None
    assert resolve_mesh(1) is None
    assert resolve_mesh("off") is None
    assert resolve_mesh("0") is None
    m = resolve_mesh(8)
    assert m is not None and m.devices.size == 8
    assert resolve_mesh(m) is m
    auto = resolve_mesh("auto")
    from dipole_tpu.api import AutoMesh

    assert isinstance(auto, AutoMesh)
    assert auto.mesh.devices.size == len(jax.devices())
    assert resolve_mesh(auto) is auto
    assert resolve_mesh("4").devices.size == 4
    with pytest.raises(ValueError):
        resolve_mesh(3.5)


def test_stage_mesh_decision_table(mesh):
    """--mesh auto per-stage selection (VERDICT r3 item 6): explicit meshes
    force sharding; auto keeps the collective-bound sequential stages
    single-chip up to capacity and shards the throughput stages — the
    winners measured by tools/mesh_auto_bench.py (2026-08-18 CPU-mesh run,
    table in api.stage_mesh's docstring)."""
    from dipole_tpu import api

    am = api.AutoMesh(mesh)
    assert api.stage_mesh(None, "greedy", 100) is None
    # explicit: forced everywhere
    for stage in ("greedy", "patch", "replay", "sign_fix", "ensemble"):
        assert api.stage_mesh(mesh, stage, 10_000) is mesh
    # auto: single-chip winners stay single-chip
    for stage in ("greedy", "patch", "replay", "sign_fix"):
        assert api.stage_mesh(am, stage, 10_000) is None
    # auto: sharded winners shard
    for stage in ("ensemble", "field"):
        assert api.stage_mesh(am, stage) is mesh
    # capacity overrides speed for the greedy
    assert api.stage_mesh(am, "greedy",
                          api._greedy_single_chip_max() + 1) is mesh


def test_orient_simple_auto_mesh_matches_single(mesh):
    """mesh='auto' end-to-end: the small-N pipeline must route to the
    single-chip paths and produce identical output."""
    from dipole_tpu import api

    rng = np.random.default_rng(5)
    v = rng.normal(size=(256, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pc = np.concatenate([v, v], axis=1).astype(np.float32)
    out_auto = api.orient_simple(pc.copy(), diffuse=True,
                                 mesh=api.AutoMesh(mesh))
    out_single = api.orient_simple(pc.copy(), diffuse=True)
    assert np.array_equal(out_auto, out_single)
