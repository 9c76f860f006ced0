"""PCA utilities and unoriented normal estimation.

Replaces the reference's Open3D / torch_cluster normal estimation
(util.py:520-567): native KD-tree neighbor search (O(N log N)) + masked
covariance + closed-form batched 3x3 eigendecomposition. The hybrid
criterion (k nearest neighbors, then radius filter) mirrors Open3D's
KDTreeSearchParamHybrid so inputs stay comparable (SURVEY §7 hard parts).
The O(N k) covariance pass runs on the local CPU backend — at these shapes
it is transfer-bound, not compute-bound, on the tunneled TPU."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dipole_tpu.ops.linalg import eigh3x3, smallest_eigvec_3x3
from dipole_tpu.ops.neighbors import knn

__all__ = [
    "pca_eigen_values", "rotate_to_principle_components",
    "estimate_normals", "estimate_normals_knn", "orient_center",
]

_HI = jax.lax.Precision.HIGHEST


def pca_eigen_values(x):
    """(smallest eigenvalue, its eigenvector) of the xyz covariance
    (reference util.py:495-500). Host-friendly numpy implementation."""
    x = np.asarray(x, dtype=np.float64)[:, :3]
    temp = x - x.mean(axis=0)
    cov = temp.T @ temp / x.shape[0]
    e, v = np.linalg.eigh(cov)
    return e[0:1].astype(np.float32), v[:, 0].astype(np.float32)


def rotate_to_principle_components(x, scale: bool = True):
    """Rotate (and optionally scale) a cloud into its PCA frame (reference
    util.py:503-517). Accepts (N,3) or (N,6) — normals are rotated too.
    jnp implementation (used inside the PointCNN forward)."""
    x = jnp.asarray(x, jnp.float32)
    xyz = x[:, :3]
    temp = xyz - xyz.mean(axis=0)[None, :]
    cov = jnp.einsum("ni,nj->ij", temp, temp, precision=_HI) / x.shape[0]
    e, v = eigh3x3(cov)
    rotated = jnp.dot(xyz, v, precision=_HI)
    if scale:
        rotated = rotated / jnp.sqrt(e[2])
    if x.shape[1] == 6:
        rotated = jnp.concatenate([rotated, jnp.dot(x[:, 3:6], v, precision=_HI)], axis=-1)
    return rotated


def _masked_pca_impl(neigh: jnp.ndarray, valid: jnp.ndarray):
    """Smallest-eigenvector normals from (N, k, 3) neighborhoods with a
    validity mask (N, k)."""
    w = valid.astype(jnp.float32)[..., None]
    cnt = jnp.maximum(w.sum(axis=1), 1.0)
    mean = (neigh * w).sum(axis=1) / cnt
    d = (neigh - mean[:, None, :]) * w
    cov = jnp.einsum("nki,nkj->nij", d, d, precision=_HI) / cnt[..., None]
    return smallest_eigvec_3x3(cov)


_masked_pca_normals = jax.jit(_masked_pca_impl)

# the covariance pass is O(N k) — tunnel-transfer-bound on the TPU backend,
# so pin it to the local CPU backend when one is registered
try:
    _CPU_DEVICE = jax.local_devices(backend="cpu")[0]
except Exception:  # no cpu backend registered
    _CPU_DEVICE = None


def _masked_pca_best(neigh: np.ndarray, valid: np.ndarray) -> np.ndarray:
    if _CPU_DEVICE is not None:
        return np.asarray(_masked_pca_normals(
            jax.device_put(neigh, _CPU_DEVICE),
            jax.device_put(valid, _CPU_DEVICE),
        ))
    return np.asarray(_masked_pca_normals(jnp.asarray(neigh), jnp.asarray(valid)))


def estimate_normals(inputpc, max_nn: int = 30, radius: float = 0.1,
                     keep_orientation: bool = False) -> np.ndarray:
    """Unoriented PCA normals with Open3D's hybrid search criterion: up to
    max_nn nearest neighbors (including self) within `radius` (reference
    util.py:551-567). Returns (N, 6).

    Neighbor search runs on the native host KD-tree (O(N log N) — the
    brute-force device kNN loses at normal-estimation scales); the masked
    covariance + closed-form 3x3 eigendecomposition run on device."""
    from dipole_tpu import native

    import os

    inputpc = np.asarray(inputpc, dtype=np.float32)
    pos = inputpc[:, :3]
    n = len(pos)
    k = min(max_nn, n)
    idx, d2 = native.knn(pos, pos, k)
    normals = None
    if os.environ.get("DIPOLE_TPU_NATIVE_PCA"):
        # opt-in fully-native PCA (same closed form, float-tolerance
        # equal; skips the (N,k,3) gather + jax dispatch — the serving
        # host floor's largest stage). Opt-in rather than default so the
        # published demo numbers stay bit-reproducible: the cascade is
        # chaotic, so even 1-ULP normal changes can move e2e scores.
        normals = native.pca_normals(pos, idx, d2, radius * radius)
    if normals is None:
        normals = _masked_pca_best(pos[idx], d2 <= radius * radius)
    out = np.concatenate([pos, normals.astype(np.float32)], axis=1)
    if keep_orientation and inputpc.shape[1] == 6:
        flip = (inputpc[:, 3:6] * out[:, 3:6]).sum(axis=-1) < 0
        out[flip, 3:6] *= -1
    return out


def estimate_normals_knn(inputpc, max_nn: int = 30) -> np.ndarray:
    """Pure-kNN variant (the reference's torch_cluster fallback,
    util.py:520-529): no radius filter."""
    inputpc = np.asarray(inputpc, dtype=np.float32)
    pos = inputpc[:, :3]
    k = min(max_nn, len(pos))
    idx, _ = knn(pos, pos, k)
    neigh = np.asarray(pos)[np.asarray(idx)]
    normals = _masked_pca_best(neigh, np.ones(neigh.shape[:2], bool))
    return np.concatenate([pos, normals.astype(np.float32)], axis=1)


def orient_center(pred: np.ndarray) -> np.ndarray:
    """Flip normals toward the centroid-outward direction (reference
    util.py:39-44). Returns a new array."""
    from dipole_tpu.utils.io import orient_center_np

    return orient_center_np(pred)
