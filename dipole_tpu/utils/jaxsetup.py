"""Process-wide JAX configuration: persistent compilation cache, and
honoring an explicit JAX_PLATFORMS request.

Imported from dipole_tpu.__init__ so every entry point (CLI, server, bench,
tests) reuses compiled executables across processes — propagation scans and
field kernels compile once per shape bucket, ever.
"""
import os
from pathlib import Path

import jax

_cache_dir = os.environ.get(
    "DIPOLE_TPU_JAX_CACHE",
    str(Path.home() / ".cache" / "dipole_tpu" / "jax"),
)
Path(_cache_dir).mkdir(parents=True, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Some remote-TPU plugins (axon) force-append their platform to
# jax_platforms at import time, overriding the user's explicit
# JAX_PLATFORMS — so `JAX_PLATFORMS=cpu dipole-orient ...` would still try
# to initialize the remote backend and block for minutes if its tunnel is
# down. Re-assert the user's explicit choice after plugins have loaded.
_plat = os.environ.get("JAX_PLATFORMS")
if _plat and jax.config.jax_platforms != _plat:
    jax.config.update("jax_platforms", _plat)
