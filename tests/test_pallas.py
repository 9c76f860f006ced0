"""Pallas kernel equivalence (interpret mode on CPU) + dispatch gating."""
import numpy as np
import pytest

import jax
from jax.experimental.pallas import tpu as pltpu

from dipole_tpu.ops import fields
from dipole_tpu.ops import fields_pallas as fp


def random_cloud(n, seed=0):
    r = np.random.default_rng(seed)
    pc = r.normal(size=(n, 6)).astype(np.float32)
    pc[:, 3:] /= np.linalg.norm(pc[:, 3:], axis=1, keepdims=True)
    return pc


def test_pallas_field_matches_xla_interpret():
    src = random_cloud(600, 1)
    tgt = random_cloud(300, 2)
    with pltpu.force_tpu_interpret_mode():
        Ep = np.asarray(fp.field_grad_pallas(src, tgt))
    Ex = np.asarray(fields.field_grad(src, tgt))
    np.testing.assert_allclose(Ep, Ex, rtol=1e-3, atol=1e-3)


def test_pallas_potential_matches_xla_interpret():
    src = random_cloud(600, 3)
    tgt = random_cloud(300, 4)
    with pltpu.force_tpu_interpret_mode():
        pp = np.asarray(fp.potential_pallas(src, tgt))
    px = np.asarray(fields.potential(src, tgt))
    np.testing.assert_allclose(pp, px, rtol=1e-3, atol=1e-3)


def test_pallas_zero_distance_masked_interpret():
    pc = random_cloud(300, 5)
    with pltpu.force_tpu_interpret_mode():
        E = np.asarray(fp.field_grad_pallas(pc, pc))
    assert np.isfinite(E).all()
    E_other = np.asarray(fields.field_grad(pc[1:], pc[:1]))
    np.testing.assert_allclose(E[:1], E_other, rtol=1e-3, atol=1e-3)


def test_dispatch_gating_cpu():
    # on the CPU test platform the pallas path must not be selected
    assert not fp.available()
    assert not fields._use_pallas(100)


def test_pallas_greedy_matches_scan_interpret():
    from dipole_tpu.ops import propagate
    from dipole_tpu.ops import propagate_pallas
    from tests.conftest import make_sphere, scramble_signs

    gt = make_sphere(300, seed=6)
    pc, _ = scramble_signs(gt, seed=7)
    with pltpu.force_tpu_interpret_mode():
        acc_p, sign_p = propagate_pallas.greedy_sign_sequence_pallas(pc)
    acc_s, sign_s = propagate.greedy_sign_sequence(pc)
    assert (np.asarray(sign_s) == sign_p).mean() == 1.0
    assert np.allclose(acc_p, np.asarray(acc_s), rtol=1e-3, atol=1e-2)


def test_pallas_greedy_streamed_matches_scan_interpret():
    """HBM-streamed greedy (capacity past the VMEM-resident ceiling): same
    decisions as the XLA on-the-fly scan, including with diffuse-relevant
    acc values and a nonzero start point."""
    import os

    from dipole_tpu.ops import propagate, propagate_pallas
    from tests.conftest import make_sphere, scramble_signs

    pc, _ = scramble_signs(make_sphere(500, seed=13), seed=14)
    with pltpu.force_tpu_interpret_mode():
        acc_p, sign_p = propagate_pallas.greedy_sign_sequence_pallas_streamed(
            pc, starting_point=7, eps=1e-6)
    os.environ["DIPOLE_TPU_NO_PALLAS"] = "1"
    try:
        acc_s, sign_s = propagate.greedy_sign_sequence(
            pc, starting_point=7, matrix_limit=0)
    finally:
        os.environ.pop("DIPOLE_TPU_NO_PALLAS")
    assert (np.asarray(sign_s) == sign_p).all()
    np.testing.assert_allclose(acc_p, np.asarray(acc_s), rtol=1e-4, atol=1e-5)


def test_pallas_greedy_streamed_multisegment_interpret(monkeypatch):
    """The segmented launch chain (bounded-duration launches with the greedy
    state aliased in place) must produce the same decisions as one launch:
    force tiny segments so the continuation (init_flag=0) path runs."""
    import os

    from dipole_tpu.ops import propagate, propagate_pallas
    from tests.conftest import make_sphere, scramble_signs

    pc, _ = scramble_signs(make_sphere(300, seed=21), seed=22)
    # nb=1024, M=128 -> seg = 37*128//128... force seg ~ 37 steps -> ~28
    # segment launches covering 1023 steps
    monkeypatch.setattr(propagate_pallas, "SEG_WORK", 37 * 128)
    with pltpu.force_tpu_interpret_mode():
        acc_p, sign_p = propagate_pallas.greedy_sign_sequence_pallas_streamed(
            pc, starting_point=3, eps=1e-6)
    os.environ["DIPOLE_TPU_NO_PALLAS"] = "1"
    try:
        acc_s, sign_s = propagate.greedy_sign_sequence(
            pc, starting_point=3, matrix_limit=0)
    finally:
        os.environ.pop("DIPOLE_TPU_NO_PALLAS")
    assert (np.asarray(sign_s) == sign_p).all()
    assert np.allclose(acc_p, np.asarray(acc_s), rtol=1e-3, atol=1e-2)
