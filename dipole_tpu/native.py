"""ctypes bridge to the native host runtime (native/dipole_native.cpp).

Provides multithreaded KD-tree kNN, CSR BFS routes and the flip local-search
solver as first-party native code (the reference leaned on scipy/sklearn/
Open3D C++ for these; SURVEY §2.3). The library is built on demand with the
in-repo Makefile; every entry point has a pure-Python/scipy fallback, so the
framework works without a compiler too.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libdipole_native.so"
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _LIB_PATH.exists():
            subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(str(_LIB_PATH))
        lib.dn_knn.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
        ]
        lib.dn_bfs_route.restype = ctypes.c_int
        lib.dn_bfs_route.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.dn_flip_local_search.restype = ctypes.c_double
        lib.dn_flip_local_search.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_double), ctypes.c_int8,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
        ]
        lib.dn_hoppe_orient.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_int8),
        ]
        if hasattr(lib, "dn_pca_normals"):  # absent in pre-r5 builds
            lib.dn_pca_normals.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_float, ctypes.POINTER(ctypes.c_float),
            ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def knn(base: np.ndarray, query: np.ndarray, k: int):
    """(indices (m,k), squared distances (m,k)) — sorted ascending.
    Falls back to scipy cKDTree."""
    base = np.ascontiguousarray(np.asarray(base, np.float32)[:, :3])
    query = np.ascontiguousarray(np.asarray(query, np.float32)[:, :3])
    n, m = len(base), len(query)
    k = min(k, n)
    lib = _load()
    if lib is None:
        from scipy.spatial import cKDTree

        d, i = cKDTree(base).query(query, k=k)
        if k == 1:
            d, i = d[:, None], i[:, None]
        return i.astype(np.int64), (d ** 2).astype(np.float32)
    idx = np.empty((m, k), np.int32)
    d2 = np.empty((m, k), np.float32)
    lib.dn_knn(
        base.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        query.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), m, k,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        d2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return idx.astype(np.int64), d2


def bfs_route_csr(indptr: np.ndarray, indices: np.ndarray, start: int):
    """BFS order with disconnected-component restart over a CSR graph.
    Returns (route (n,), n_components)."""
    n = len(indptr) - 1
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    lib = _load()
    if lib is None:
        # python fallback
        from collections import deque

        visited = np.zeros(n, bool)
        out = np.empty(n, np.int64)
        q = deque([start])
        visited[start] = True
        written = 0
        comp = 1
        scan = 0
        while written < n:
            if not q:
                while scan < n and visited[scan]:
                    scan += 1
                if scan >= n:
                    break
                visited[scan] = True
                q.append(scan)
                comp += 1
            u = q.popleft()
            out[written] = u
            written += 1
            for j in range(indptr[u], indptr[u + 1]):
                v = indices[j]
                if not visited[v]:
                    visited[v] = True
                    q.append(v)
        return out, comp
    out = np.empty(n, np.int64)
    comp = lib.dn_bfs_route(
        n, indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int)), int(start),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    return out, comp


def hoppe_orient_signs(xyz: np.ndarray, nrm: np.ndarray, k: int):
    """Native Hoppe consistent orientation: kNN graph + 1-|n.n| Prim MST +
    per-component max-z seeding + DFS sign propagation, all in C++
    (replaces the Python edge-dedup/heapq-MST host stages, VERDICT r3
    item 5). Returns signs (n,) in {+1, -1}, or None when the library is
    unavailable (callers keep the Python fallback)."""
    lib = _load()
    if lib is None:
        return None
    xyz = np.ascontiguousarray(np.asarray(xyz, np.float32)[:, :3])
    nrm = np.ascontiguousarray(np.asarray(nrm, np.float32)[:, :3])
    n = len(xyz)
    out = np.empty(n, np.int8)
    lib.dn_hoppe_orient(
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        nrm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, int(k),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    return out


def flip_local_search(M: np.ndarray, x0: np.ndarray, minimize: bool,
                      max_rounds: int = 256):
    """Native single-flip descent on obj = sum M_ij xor_ij. Returns x."""
    lib = _load()
    x = np.ascontiguousarray(np.asarray(x0, np.uint8).copy())
    if lib is None:
        return None
    M = np.ascontiguousarray(np.asarray(M, np.float64))
    lib.dn_flip_local_search(
        len(x), M.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        -1 if minimize else 1,
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), max_rounds,
    )
    return x


def pca_normals(pos: np.ndarray, idx: np.ndarray, d2: np.ndarray,
                r2: float):
    """Masked-PCA smallest-eigenvector normals over precomputed kNN
    neighborhoods (same closed form as ops/linalg.eigh3x3 — see
    dn_pca_normals). Returns (n, 3) float32, or None when the native
    library is unavailable or predates the symbol."""
    lib = _load()
    if lib is None or not hasattr(lib, "dn_pca_normals"):
        return None
    pos = np.ascontiguousarray(np.asarray(pos, np.float32)[:, :3])
    idx = np.ascontiguousarray(np.asarray(idx, np.int32))
    d2 = np.ascontiguousarray(np.asarray(d2, np.float32))
    n, k = idx.shape
    out = np.empty((n, 3), np.float32)
    lib.dn_pca_normals(
        pos.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n,
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        d2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        k, float(r2),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
