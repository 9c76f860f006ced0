"""Field kernel tests: analytic single-dipole values, dense numpy oracle
equivalence (incl. block-tiling equivalence), zero-distance masking, and the
linearity property the propagation design relies on."""
import numpy as np
import pytest

from dipole_tpu.ops import fields
from dipole_tpu.utils.io import gen_grid


# --- dense numpy oracle, written straight from the physics ----------------

def oracle_field(sources, targets, eps=1e-5):
    s_pos, p = sources[:, :3].astype(np.float64), sources[:, 3:6].astype(np.float64)
    t = np.asarray(targets)[:, :3].astype(np.float64)
    R = s_pos[None, :, :] - t[:, None, :]
    r = np.linalg.norm(R, axis=-1)
    zero = r == 0
    with np.errstate(divide="ignore", invalid="ignore"):
        Rhat = np.where(zero[..., None], 0.0, R / np.where(zero, 1, r)[..., None])
        E = 3 * (p[None] * Rhat).sum(-1)[..., None] * Rhat - p[None]
        E = np.where(zero[..., None], 0.0, E)
        E = E / (r ** 3 + eps)[..., None]
    out = -E.sum(axis=1)
    out[~np.isfinite(out)] = 0
    return out


def oracle_potential(sources, targets):
    s_pos, p = sources[:, :3].astype(np.float64), sources[:, 3:6].astype(np.float64)
    t = np.asarray(targets)[:, :3].astype(np.float64)
    R = s_pos[None, :, :] - t[:, None, :]
    r = np.linalg.norm(R, axis=-1)
    with np.errstate(divide="ignore", invalid="ignore"):
        phi = (p[None] * R).sum(-1) / r ** 3
    out = phi.sum(axis=1)
    out[~np.isfinite(out)] = 0
    return out


def random_cloud(n, seed=0):
    r = np.random.default_rng(seed)
    pc = r.normal(size=(n, 6)).astype(np.float32)
    pc[:, 3:] /= np.linalg.norm(pc[:, 3:], axis=1, keepdims=True)
    return pc


def test_single_dipole_analytic():
    # dipole p = +z at origin; target on +z axis at distance d:
    # E(dipole formula, sign per reference) = -(3(p.z)z - p)/d^3 = -2p/d^3
    src = np.array([[0, 0, 0, 0, 0, 1.0]], dtype=np.float32)
    tgt = np.array([[0, 0, 2.0]], dtype=np.float32)
    E = np.asarray(fields.field_grad(src, tgt, eps=0.0))
    np.testing.assert_allclose(E, [[0, 0, -2 / 8]], rtol=1e-5, atol=1e-7)
    # potential at R = s - t = (0,0,-2): p.R/|R|^3 = -2/8
    phi = np.asarray(fields.potential(src, tgt))
    np.testing.assert_allclose(phi, [-2 / 8], rtol=1e-5)
    # equatorial point: p.R = 0 -> phi = 0; E = -(0 - p)/d^3 = +p/d^3
    tgt = np.array([[3.0, 0, 0]], dtype=np.float32)
    np.testing.assert_allclose(np.asarray(fields.potential(src, tgt)), [0], atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(fields.field_grad(src, tgt, eps=0.0)), [[0, 0, 1 / 27]],
        rtol=1e-5, atol=1e-7,
    )


@pytest.mark.parametrize("n,m", [(7, 5), (300, 200), (1500, 1100)])
def test_field_matches_oracle(n, m):
    src = random_cloud(n, 1)
    tgt = random_cloud(m, 2)
    E = np.asarray(fields.field_grad(src, tgt))
    np.testing.assert_allclose(E, oracle_field(src, tgt), rtol=1e-3, atol=5e-5)
    phi = np.asarray(fields.potential(src, tgt))
    np.testing.assert_allclose(phi, oracle_potential(src, tgt), rtol=1e-3, atol=5e-5)


def test_blocking_equivalence():
    """Results must not depend on how the pair space is tiled (the
    reference's recursive-halving property, SURVEY §2.2). Uses separated
    sphere clouds so f32 summation-order noise stays far below tolerance."""
    from tests.conftest import make_sphere

    src = make_sphere(2500, seed=3)
    tgt = make_sphere(2100, seed=4) * 2.0
    full = np.asarray(fields.field_grad(src, tgt))
    half = np.asarray(fields.field_grad(src[:1250], tgt)) + np.asarray(
        fields.field_grad(src[1250:], tgt)
    )
    np.testing.assert_allclose(full, half, rtol=1e-3, atol=1e-3)


def test_zero_distance_masked():
    pc = random_cloud(50, 5)
    E = np.asarray(fields.field_grad(pc, pc))
    assert np.isfinite(E).all()
    # field at a source's own location excludes that source: compare point 0
    # against field of the others only
    E_other = np.asarray(fields.field_grad(pc[1:], pc[:1]))
    np.testing.assert_allclose(E[:1], E_other, rtol=1e-4, atol=1e-5)


def test_potential_coincident_scrubbed():
    src = np.array([[0, 0, 0, 0, 0, 1.0]], dtype=np.float32)
    tgt = np.array([[0, 0, 0.0], [0, 0, 1.0]], dtype=np.float32)
    phi = np.asarray(fields.potential(src, tgt))
    assert phi[0] == 0.0            # inf/nan scrubbed
    np.testing.assert_allclose(phi[1], -1.0, rtol=1e-5)


def test_interaction_matrix_linearity():
    """I must satisfy: E_from_subset(x_i).n_i == sum_j I_ij for the subset —
    the property the propagation rewrite depends on."""
    pc = random_cloud(300, 6)
    I = np.asarray(fields.dipole_interaction_matrix(pc, eps=1e-6))
    subset = np.arange(0, 300, 3)
    E = np.asarray(fields.field_grad(pc[subset], pc, eps=1e-6))
    direct = (E * pc[:, 3:6]).sum(-1)
    via_matrix = I[:, subset].sum(-1)
    np.testing.assert_allclose(direct, via_matrix, rtol=2e-3, atol=2e-4)


def test_xie_matrix_against_formula():
    pc = random_cloud(100, 7)
    C = 3.0
    I = np.asarray(fields.xie_interaction_matrix(pc, C=C))
    # dense oracle
    s_pos, s_n = pc[:, :3].astype(np.float64), pc[:, 3:6].astype(np.float64)
    R = s_pos[None, :, :] - s_pos[:, None, :]
    r = np.linalg.norm(R, axis=-1)
    zero = r == 0
    Rhat = np.where(zero[..., None], 0.0, R / np.where(zero, 1, r)[..., None])
    f = s_n[None] - C * (s_n[None] * Rhat).sum(-1)[..., None] * Rhat
    f = np.where(zero[..., None], f, f / np.where(zero, 1, r ** 3)[..., None])
    oracle = (f * s_n[:, None, :]).sum(-1)
    oracle[~np.isfinite(oracle)] = 0
    np.testing.assert_allclose(I, oracle, rtol=2e-4, atol=2e-5)
    # diagonal is n.n = 1 (undivided at zero distance)
    np.testing.assert_allclose(np.diag(I), 1.0, rtol=1e-5)


def test_point_group_interaction():
    # well-separated cloud (sphere): bounded 1/r^3 terms keep f32 noise small
    from tests.conftest import make_sphere
    pc = make_sphere(400, seed=8)
    gid = np.random.default_rng(9).integers(0, 7, 400)
    F = np.asarray(fields.point_group_interaction(pc, gid, 7, eps=1e-5))
    I = np.asarray(fields.dipole_interaction_matrix(pc, eps=1e-5))
    for g in range(7):
        got, want = F[:, g], I[:, gid == g].sum(-1)
        # f32 sums of large cancelling terms: tolerance scales with the
        # absolute-value sum of the summands, not the (small) net result
        scale = np.abs(I[:, gid == g]).sum(-1)
        assert np.all(np.abs(got - want) <= 1e-2 * np.abs(want) + 1e-3 * scale + 1e-3)


def test_mean_potential_sign():
    # outward-oriented sphere: positive mean potential on surrounding lattice
    from tests.conftest import make_sphere
    pc = make_sphere(400) * 0.4  # scale inside the lattice
    pc[:, 3:6] = pc[:, 3:6] / np.linalg.norm(pc[:, 3:6], axis=1, keepdims=True)
    mp = fields.measure_mean_potential(pc)
    pc_flip = pc.copy()
    pc_flip[:, 3:6] *= -1
    mp_flip = fields.measure_mean_potential(pc_flip)
    assert mp > 0 and mp_flip < 0
    grid = gen_grid(10)
    assert grid.shape == (1000, 3)
    assert grid.min() == -1.0 and abs(grid.max() - 0.8) < 1e-6


def test_eigh3x3_gradients_finite_at_degeneracy():
    """Repeated/zero eigenvalues (any surface of revolution) must not NaN
    the backward pass — arccos at r=+-1 and sqrt(0) in the normalizations
    leaked inf grads through dead where-branches and destroyed training on
    the vase cloud (round 2)."""
    import jax
    import jax.numpy as jnp

    from dipole_tpu.ops.linalg import eigh3x3

    def f(A):
        w, V = eigh3x3(A)
        return jnp.sum(w) + jnp.sum(V * jnp.arange(9.0).reshape(3, 3))

    for diag in ([1.0, 1.0, 0.1], [2.0, 2.0, 2.0], [1e-4, 0.5, 0.5],
                 [0.0, 0.0, 0.0], [0.0, 0.0, 1.0]):
        g = jax.grad(f)(jnp.diag(jnp.asarray(diag)))
        assert bool(jnp.isfinite(g).all()), diag


def test_interaction_matrix_bucket_padding_is_exact_zero():
    """bucket= computes at the padded size with EXACTLY zero padded
    rows/columns (zero-normal targets, zero-moment sources) and the same
    real block as the sliced path."""
    from dipole_tpu.ops import fields

    rng = np.random.default_rng(11)
    pc = rng.normal(size=(200, 6)).astype(np.float32)
    pc[:, 3:] /= np.linalg.norm(pc[:, 3:], axis=1, keepdims=True)
    for fn, kw in [(fields.xie_interaction_matrix, {"C": 3.0}),
                   (fields.dipole_interaction_matrix, {"eps": 1e-6})]:
        Ib = np.asarray(fn(pc, bucket=1024, **kw))
        I = np.asarray(fn(pc, **kw))
        assert Ib.shape == (1024, 1024)
        np.testing.assert_array_equal(Ib[200:, :], 0.0)
        np.testing.assert_array_equal(Ib[:, 200:], 0.0)
        np.testing.assert_allclose(Ib[:200, :200], I, rtol=1e-6, atol=1e-7)
