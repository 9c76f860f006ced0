"""Warm-by-default first run (VERDICT r3 item 8).

The axon TPU backend defers XLA compilation to first execution, so a bare
CLI run on a cold machine pays a multi-minute stall in the middle of its
first pipeline (measured: 1 m 27.9 s inside "dipole propagation" for a 10k
orient_simple; BASELINE.md compile-tax notes). The backend's compile cache
keyed on program shapes makes SUBSEQUENT fresh processes warm — so the fix
is to walk the standard program matrix once per machine.

ensure_warm() runs that walk automatically on a CLI's first-ever TPU use:
it compiles the per-point pipeline's program set (greedy matrix + streamed
propagation buckets, lattice sign fix, normal-estimation kernels) on tiny
synthetic clouds, then drops a marker so every later invocation skips
straight to work. The full demo-suite network matrix (minutes of extra
compiles) stays opt-in via tools/warm_compile_cache.py --demos.

Escape hatches:
  DIPOLE_TPU_NO_AUTOWARM=1  - never auto-warm (flag-off hatch)
  DIPOLE_TPU_AUTOWARM=full  - also warm the PointCNN forward matrix
Marker: ~/.cache/dipole_tpu/autowarm_v<N>.done (delete to re-warm).
"""
from __future__ import annotations

import os
from pathlib import Path

import numpy as np

__all__ = ["ensure_warm", "marker_path", "WARM_VERSION"]

WARM_VERSION = 1


def marker_path() -> Path:
    base = Path(os.environ.get("DIPOLE_TPU_CACHE_DIR",
                               Path.home() / ".cache" / "dipole_tpu"))
    return base / f"autowarm_v{WARM_VERSION}.done"


def _cloud(n: int, seed: int = 0) -> np.ndarray:
    r = np.random.default_rng(seed)
    v = r.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pc = np.concatenate([v + r.normal(scale=0.01, size=(n, 3)), v], axis=1)
    return pc.astype(np.float32)


def _warm_simple() -> None:
    """Compile the orient_simple program set: every greedy-dispatch branch a
    first CLI run can reach at common sizes (matrix <=10k, VMEM-Pallas above),
    the diffuse re-vote, the lattice sign fix, and the estimate-normals
    kernels. Values are irrelevant — compilation is keyed on shapes."""
    from dipole_tpu import api

    # matrix greedy at the 2k and 16k buckets (ok.xyz-class inputs land on
    # the 16384 bucket) + estimate + sign fix, via the real pipeline
    api.orient_simple(_cloud(1500)[:, :3], diffuse=True, estimate=True)
    api.orient_simple(_cloud(9000, 1), diffuse=True)
    # on-the-fly Pallas greedy bucket (>10k cloud)
    api.orient_simple(_cloud(12000, 2), diffuse=True)


def _warm_network() -> None:
    """Opt-in: the batched PointCNN forward matrix the demo suite reaches."""
    import jax

    from dipole_tpu.models.pointcnn import pointcnn_logits_batched
    from dipole_tpu import train

    params = {k: np.asarray(v) for k, v in
              train.init_params(jax.random.PRNGKey(0)).items()}
    r = np.random.default_rng(0)
    for bucket, pool in ((512, 0.6), (512, 0.99)):
        patches = [r.normal(size=(bucket // 2, 6)).astype(np.float32)
                   for _ in range(2)]
        pointcnn_logits_batched(params, pool, patches,
                                key=jax.random.PRNGKey(0), bucket=bucket)


def ensure_warm(quiet: bool = False) -> bool:
    """Walk the standard program matrix once per machine (TPU backends
    only). Returns True when a warm pass actually ran."""
    if os.environ.get("DIPOLE_TPU_NO_AUTOWARM"):
        return False
    mark = marker_path()
    if mark.exists():
        return False
    try:
        import jax

        platform = jax.devices()[0].platform
    except Exception:
        return False
    if platform != "tpu":
        # CPU/GPU compiles are seconds — not worth a marker dance
        return False
    if not quiet:
        print("dipole_tpu: first run on this machine — pre-compiling the "
              "standard program set so this and every later run start warm "
              "(a few minutes, once; set DIPOLE_TPU_NO_AUTOWARM=1 to skip)",
              flush=True)
    _warm_simple()
    if os.environ.get("DIPOLE_TPU_AUTOWARM", "").lower() == "full":
        _warm_network()
    mark.parent.mkdir(parents=True, exist_ok=True)
    mark.write_text("ok\n")
    if not quiet:
        print("dipole_tpu: warm-up done", flush=True)
    return True
