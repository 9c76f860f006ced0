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


def test_pallas_greedy_xl_matches_scan_interpret():
    """XL greedy (acc/sign state HBM-resident, selection fused into the
    sweep — capacity past the streamed kernel's VMEM state budget,
    VERDICT r3 item 7): same decisions as the XLA scan, including a
    nonzero start point and multi-segment launches (the f32 [m, c] carry
    crosses launch boundaries)."""
    import os

    from dipole_tpu.ops import propagate, propagate_pallas
    from tests.conftest import make_sphere, scramble_signs

    pc, _ = scramble_signs(make_sphere(500, seed=31), seed=32)
    with pltpu.force_tpu_interpret_mode():
        acc_p, sign_p = propagate_pallas.greedy_sign_sequence_pallas_xl(
            pc, starting_point=7, eps=1e-6)
    os.environ["DIPOLE_TPU_NO_PALLAS"] = "1"
    try:
        acc_s, sign_s = propagate.greedy_sign_sequence(
            pc, starting_point=7, matrix_limit=0)
    finally:
        os.environ.pop("DIPOLE_TPU_NO_PALLAS")
    assert (np.asarray(sign_s) == sign_p).all()
    np.testing.assert_allclose(acc_p, np.asarray(acc_s), rtol=1e-4, atol=1e-5)


def test_pallas_greedy_xl_many_chunks_interpret(monkeypatch):
    """K >= 3 sweep chunks: exercises the pipelined prefetch + deferred
    acc write-back waits (slot reuse at k+2) and the epilogue waits — at
    full _XL_CHUNK width that path only engages past ~400k points, far
    beyond interpret-mode reach, so the chunk width is shrunk instead."""
    import os

    from dipole_tpu.ops import propagate, propagate_pallas
    from tests.conftest import make_sphere, scramble_signs

    pc, _ = scramble_signs(make_sphere(900, seed=51), seed=52)
    monkeypatch.setattr(propagate_pallas, "_XL_CHUNK", 32)
    # nb = 1024 -> M = 128 -> K = 4 chunks per sweep
    with pltpu.force_tpu_interpret_mode():
        acc_p, sign_p = propagate_pallas.greedy_sign_sequence_pallas_xl(
            pc, starting_point=5, eps=1e-6)
    os.environ["DIPOLE_TPU_NO_PALLAS"] = "1"
    try:
        acc_s, sign_s = propagate.greedy_sign_sequence(
            pc, starting_point=5, matrix_limit=0)
    finally:
        os.environ.pop("DIPOLE_TPU_NO_PALLAS")
    assert (np.asarray(sign_s) == sign_p).all()
    np.testing.assert_allclose(acc_p, np.asarray(acc_s), rtol=1e-4, atol=1e-5)


def test_pallas_greedy_xl_multisegment_interpret(monkeypatch):
    """Segmented XL launches must be bit-identical to one launch."""
    from dipole_tpu.ops import propagate_pallas
    from tests.conftest import make_sphere, scramble_signs

    pc, _ = scramble_signs(make_sphere(300, seed=41), seed=42)
    with pltpu.force_tpu_interpret_mode():
        acc_one, sign_one = propagate_pallas.greedy_sign_sequence_pallas_xl(
            pc, starting_point=3, eps=1e-6)
    monkeypatch.setattr(propagate_pallas, "SEG_WORK_XL", 37 * 128)
    with pltpu.force_tpu_interpret_mode():
        acc_seg, sign_seg = propagate_pallas.greedy_sign_sequence_pallas_xl(
            pc, starting_point=3, eps=1e-6)
    assert np.array_equal(sign_one, sign_seg)
    assert np.array_equal(acc_one, acc_seg)


def _scan_knn_with_dist(pos_dst, pos_src, k):
    """The reference k-step argmin scan (models/pointcnn semantics)."""
    import jax.numpy as jnp

    d2 = jnp.sum((pos_src[None, :, :] - pos_dst[:, None, :]) ** 2, axis=-1)
    rows = jnp.arange(pos_dst.shape[0])

    def step(dd, _):
        j = jnp.argmin(dd, axis=1)
        v = dd[rows, j]
        dd = dd.at[rows, j].set(jnp.inf)
        return dd, (j, v)

    _, (idx, dist2) = jax.lax.scan(step, d2, None, length=k)
    return np.moveaxis(np.asarray(idx), 0, 1), np.moveaxis(np.asarray(dist2), 0, 1)


def _assert_knn_equivalent(idx_p, d2_p, idx_s, d2_s, ns):
    """Selections must agree except where the two candidates are equidistant
    to within f32 resolution. On real TPU hardware the kernel and the scan
    are bit-identical (verified on the v5e for every shape below, including
    the sentinel tie rows); under CPU interpret mode LLVM contracts the
    kernel's mul+add chain into FMAs, which moves d² by 1 ULP and can swap
    sub-ULP ties — a numerically legitimate kNN answer, asserted as such."""
    idx_p, d2_p = np.asarray(idx_p), np.asarray(d2_p)
    assert int(idx_p.max()) < ns                    # padding never escapes
    # selected-distance sequences agree to f32 resolution everywhere
    np.testing.assert_allclose(d2_p, d2_s, rtol=2e-6, atol=0)
    diff = idx_p != idx_s
    if diff.any():
        # every disagreement is a tie: the scan's distances for the two
        # competing sources differ by at most a couple of ULPs
        assert np.allclose(d2_p[diff], d2_s[diff], rtol=2e-6)
        assert diff.mean() < 0.02


@pytest.mark.parametrize("nd,ns,k,nsent", [
    (512, 512, 16, 0),       # self-kNN at the forward's bucket shape
    (308, 308, 20, 40),      # non-128-multiple (m1) with sentinel padding rows
    (185, 512, 16, 10),      # cross (interpolate-shaped) query/source
    (130, 200, 20, 190),     # nearly-all-sentinel source (tiny valid patch)
    (308, 308, 20, 8),       # FEWER sentinel rows than k: a sentinel query
                             # exhausts them and must fall through to real
                             # points, never to the wrapper's padding columns
                             # (indices >= ns) — the _PAD=3e6 offset regression
])
def test_pallas_knn_matches_scan_interpret(nd, ns, k, nsent):
    """The VMEM kNN kernel vs the k-step argmin scan it replaces in the
    PointCNN forward on TPU (same d² expression, lowest-index tie-break,
    inf masking)."""
    from dipole_tpu.ops.neighbors_pallas import knn_with_dist_pallas

    r = np.random.default_rng(nd + ns + k)
    dst = r.normal(size=(nd, 3)).astype(np.float32)
    src = r.normal(size=(ns, 3)).astype(np.float32)
    if nsent:
        src[-nsent:] = 1.0e6
    dst[-3:] = 1.0e6
    with pltpu.force_tpu_interpret_mode():
        idx_p, d2_p = knn_with_dist_pallas(dst, src, k)
    idx_s, d2_s = _scan_knn_with_dist(dst, src, k)
    _assert_knn_equivalent(idx_p, d2_p, idx_s, d2_s, ns)


def test_pallas_knn_vmapped_interpret():
    """vmap over the kernel (how the batched forward reaches it)."""
    from dipole_tpu.ops.neighbors_pallas import knn_with_dist_pallas

    r = np.random.default_rng(5)
    pos = r.normal(size=(4, 256, 3)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        idx_p, d2_p = jax.vmap(
            lambda p: knn_with_dist_pallas(p, p, 20))(pos)
    for b in range(4):
        idx_s, d2_s = _scan_knn_with_dist(pos[b], pos[b], 20)
        _assert_knn_equivalent(idx_p[b], d2_p[b], idx_s, d2_s, pos.shape[1])


@pytest.mark.skipif(
    jax.devices()[0].platform == "cpu",
    reason="bit-exactness holds on TPU hardware; interpret mode FMA-contracts")
def test_pallas_knn_bit_exact_on_tpu():
    """On the real chip the kernel's selections and distances are
    bit-identical to the scan (no FMA contraction divergence) — the property
    the forward's swap relies on for its parity story."""
    from dipole_tpu.ops.neighbors_pallas import knn_with_dist_pallas

    r = np.random.default_rng(7)
    for nd, ns, k, nsent in [(512, 512, 16, 0), (308, 308, 20, 40),
                             (130, 200, 20, 190), (308, 308, 20, 8)]:
        dst = r.normal(size=(nd, 3)).astype(np.float32)
        src = r.normal(size=(ns, 3)).astype(np.float32)
        if nsent:
            src[-nsent:] = 1.0e6
        dst[-3:] = 1.0e6
        idx_p, d2_p = knn_with_dist_pallas(dst, src, k)
        idx_s, d2_s = _scan_knn_with_dist(dst, src, k)
        assert np.array_equal(np.asarray(idx_p), idx_s)
        assert np.array_equal(np.asarray(d2_p), d2_s)


def test_forward_pallas_knn_wiring_interpret(monkeypatch):
    """Run the FULL PointCNN forward with the Pallas kNN branch forced on
    (interpret mode) and compare logits against the scan branch — covers the
    idx/d2 plumbing, the shared-scan prefixes and the interpolate swap on
    CPU CI, where available() would otherwise keep the kernel branch dead.
    Tolerance-based: interpret-mode FMA contraction may swap sub-ULP
    neighbor ties (see the kNN tests above)."""
    import jax.numpy as jnp

    from dipole_tpu import train
    from dipole_tpu.models import pointcnn

    params = train.init_params(jax.random.PRNGKey(0))
    r = np.random.default_rng(3)
    nb, pool = 128, 0.6
    m1 = int(-(-nb * pool // 1))
    m2 = int(-(-m1 * pool // 1))
    pc = jnp.asarray(r.normal(size=(nb, 6)).astype(np.float32))
    valid = jnp.asarray(np.arange(nb) < 100)
    key = jax.random.PRNGKey(5)

    lg_scan = np.asarray(pointcnn._forward(
        params, pc, valid, key, jnp.float32(pool), m1, m2))

    monkeypatch.setattr(pointcnn, "_use_pallas_knn", lambda *a: True)
    pointcnn._forward._clear_cache()
    try:
        with pltpu.force_tpu_interpret_mode():
            lg_pal = np.asarray(pointcnn._forward(
                params, pc, valid, key, jnp.float32(pool), m1, m2))
    finally:
        pointcnn._forward._clear_cache()

    np.testing.assert_allclose(lg_pal[:100], lg_scan[:100], rtol=1e-3,
                               atol=1e-4)


def test_pallas_fps_batch_matches_xla_interpret():
    """The lock-step batched FPS kernel must make the same selections as
    vmapping the XLA fori_loop FPS (first-index argmax ties, masked
    invalid rows, ragged valid counts, non-128-multiple N)."""
    from dipole_tpu.models.pointcnn import _fps_masked
    from dipole_tpu.ops.neighbors_pallas import fps_masked_batch_pallas

    r = np.random.default_rng(11)
    for B, N, m in [(8, 256, 154), (4, 308, 185), (3, 128, 77)]:
        pos = r.normal(size=(B, N, 3)).astype(np.float32)
        nv = r.integers(max(1, m // 4), N + 1, B)
        for i in range(B):
            pos[i, nv[i]:] = 1.0e6
        valid = np.arange(N)[None, :] < nv[:, None]
        starts = (r.integers(0, 1 << 30, B) % nv).astype(np.int32)
        with pltpu.force_tpu_interpret_mode():
            a = np.asarray(fps_masked_batch_pallas(
                pos, valid, m, starts))
        b = np.asarray(jax.vmap(
            lambda p, v, s: _fps_masked(p, v, m, s))(pos, valid, starts))
        # FPS distances are squared sums of generic floats: FMA-contraction
        # ties are astronomically unlikely, so exact equality is expected
        # (and holds bit-for-bit on TPU hardware, verified on the v5e)
        assert np.array_equal(a, b), (B, N, m)


def test_pallas_knn_duplicate_points_ties_interpret():
    """Exact duplicate points produce d2=0 ties at the top of every list —
    the kernel must break them to the lowest index exactly like the scan
    (coincident points are common in scanned clouds)."""
    from dipole_tpu.ops.neighbors_pallas import knn_with_dist_pallas

    r = np.random.default_rng(3)
    base = r.normal(size=(64, 3)).astype(np.float32)
    pos = np.concatenate([base, base, base[:32]], axis=0)  # every point duplicated
    with pltpu.force_tpu_interpret_mode():
        idx_p, d2_p = knn_with_dist_pallas(pos, pos, 5)
    idx_s, d2_s = _scan_knn_with_dist(pos, pos, 5)
    # duplicates tie at d2 == 0.0 exactly — no FMA drift possible at zero,
    # so the SELECTIONS must match bit-for-bit even in interpret mode (the
    # nonzero tail distances still carry the known 1-ULP contraction drift)
    assert np.array_equal(np.asarray(idx_p), idx_s)
    zero = d2_s == 0.0                                   # the duplicate ties
    assert zero.any() and (np.asarray(d2_p)[zero] == 0.0).all()
    np.testing.assert_allclose(np.asarray(d2_p), d2_s, rtol=2e-6)
