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
