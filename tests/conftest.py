"""Test config: force CPU with 8 virtual devices so sharding tests run
without TPU hardware, before jax initializes."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

# the axon plugin force-appends itself to jax_platforms at import time;
# override after import so tests always run on the virtual CPU mesh
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np
import pytest


REFERENCE_DATA = Path("/root/reference/data")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


def make_sphere(n=500, seed=0, noise=0.0):
    """Unit sphere cloud with ground-truth outward normals."""
    r = np.random.default_rng(seed)
    v = r.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pts = v.copy()
    if noise:
        pts = pts + r.normal(scale=noise, size=pts.shape)
    return np.concatenate([pts, v], axis=1).astype(np.float32)


def scramble_signs(pc, seed=1):
    """Randomly flip half the normals (simulates unoriented input)."""
    r = np.random.default_rng(seed)
    pc = pc.copy()
    flip = r.random(len(pc)) < 0.5
    pc[flip, 3:6] *= -1
    return pc, flip
