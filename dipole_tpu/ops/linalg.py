"""Closed-form symmetric 3x3 eigendecomposition (batched, TPU-friendly).

jnp.linalg.eigh lowers to a large iterative kernel on TPU whose compile time
dominates small-matrix workloads; point-cloud PCA only ever needs 3x3. This
module implements the trigonometric (Smith) eigenvalue formula plus
Cayley-Hamilton eigenvectors: pure elementwise ops, vmappable, compiles in
milliseconds.

Returns eigenvalues ascending (LAPACK convention) so callers match the
reference's torch.symeig ordering (reference util.py:495-517).
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["eigh3x3", "smallest_eigvec_3x3"]

_EPS = 1e-20


def _eigenvalues(A: jnp.ndarray):
    """Ascending eigenvalues of symmetric (..., 3, 3)."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    q = (a00 + a11 + a22) / 3.0
    p1 = a01 ** 2 + a02 ** 2 + a12 ** 2
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00 ** 2 + b11 ** 2 + b22 ** 2 + 2.0 * p1
    degenerate = p2 <= 1e-30
    # double-where: the untaken branch must also be NaN-free in the BACKWARD
    # pass (jnp.where passes NaN * 0 = NaN from the dead branch), so the
    # isotropic case computes with a substituted safe p2
    p2_safe = jnp.where(degenerate, 1.0, p2)
    p = jnp.sqrt(p2_safe / 6.0)
    inv_p = 1.0 / p
    c00, c11, c22 = b00 * inv_p, b11 * inv_p, b22 * inv_p
    c01, c02, c12 = a01 * inv_p, a02 * inv_p, a12 * inv_p
    detB = (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    # interior clip: at r = +-1 (repeated eigenvalues — any surface of
    # revolution) arccos is value-correct but its derivative is infinite,
    # which NaNs every gradient flowing through the PCA canonicalization.
    # The 1e-6 margin perturbs eigenvalues by O(1e-6 * p) and keeps
    # d/dr arccos bounded (~707).
    r = jnp.clip(detB / 2.0, -1.0 + 1e-6, 1.0 - 1e-6)
    phi = jnp.arccos(r) / 3.0
    big = q + 2.0 * p * jnp.cos(phi)
    small = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    mid = 3.0 * q - big - small
    big = jnp.where(degenerate, q, big)
    mid = jnp.where(degenerate, q, mid)
    small = jnp.where(degenerate, q, small)
    return jnp.stack([small, mid, big], axis=-1)


def _eigvec_for(A: jnp.ndarray, lam_a: jnp.ndarray, lam_b: jnp.ndarray):
    """Eigenvector of the remaining eigenvalue via Cayley-Hamilton:
    columns of (A - lam_a I)(A - lam_b I) span its eigenspace."""
    eye = jnp.eye(3, dtype=A.dtype)
    Ma = A - lam_a[..., None, None] * eye
    Mb = A - lam_b[..., None, None] * eye
    P = jnp.matmul(Ma, Mb)
    norms = jnp.sum(P * P, axis=-2)                       # column squared norms
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(P, best[..., None, None].repeat(3, axis=-2), axis=-1)[..., 0]
    n2 = jnp.sum(v * v, axis=-1, keepdims=True)
    ok = n2 > 1e-24
    # sqrt'(0) is inf and leaks NaN through the dead where-branch: normalize
    # with a substituted safe norm when degenerate
    v = v / jnp.sqrt(jnp.where(ok, n2, 1.0))
    # degenerate fallback: any unit vector is an eigenvector
    fallback = jnp.zeros_like(v).at[..., 2].set(1.0)
    return jnp.where(ok, v, fallback)


def eigh3x3(A: jnp.ndarray):
    """(eigenvalues ascending (...,3), eigenvectors (...,3,3) column-major:
    v[..., :, k] pairs with w[..., k]) for symmetric 3x3 batches."""
    A = jnp.asarray(A)
    w = _eigenvalues(A)
    v0 = _eigvec_for(A, w[..., 1], w[..., 2])             # smallest
    v2 = _eigvec_for(A, w[..., 0], w[..., 1])             # largest
    v1 = jnp.cross(v2, v0)
    n2 = jnp.sum(v1 * v1, axis=-1, keepdims=True)
    ok1 = n2 > 1e-24
    v1 = v1 / jnp.sqrt(jnp.where(ok1, n2, 1.0))
    v1 = jnp.where(ok1, v1, jnp.zeros_like(v1).at[..., 1].set(1.0))
    # re-orthogonalize v0 against v2 (guards near-degenerate pairs)
    V = jnp.stack([v0, v1, v2], axis=-1)
    return w, V


def smallest_eigvec_3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector of the smallest eigenvalue (PCA normal)."""
    A = jnp.asarray(A)
    w = _eigenvalues(A)
    return _eigvec_for(A, w[..., 1], w[..., 2])
