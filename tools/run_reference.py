"""Run the PyTorch reference implementation (CPU) for parity + baselines.

Imports the reference from /root/reference with unavailable third-party
modules stubbed (open3d, gurobipy, pymeshlab) and .cuda() neutralized, so
its torch compute path runs unmodified on CPU. Used to:
  * measure per-point sign agreement of dipole_tpu against the reference
  * record reference stage timings for BASELINE.md

Usage: python tools/run_reference.py [n_points]
"""
import sys
import time
import types
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# ---- stub unavailable native deps before importing the reference ----------
for name in ["open3d", "open3d.geometry", "open3d.utility", "open3d.io",
             "open3d.visualization", "gurobipy", "pymeshlab"]:
    if name not in sys.modules:
        sys.modules[name] = types.ModuleType(name)

import torch  # noqa: E402

torch.Tensor.cuda = lambda self, *a, **k: self  # reference forces .cuda()

sys.path.insert(0, "/root/reference")
import field_utils as ref_field_utils  # noqa: E402
import util as ref_util  # noqa: E402


def main(n_points=10000, seed=0):
    from dipole_tpu.utils.io import load_xyz, Transform
    from dipole_tpu.ops import propagate, fields
    from dipole_tpu.ops.metrics import sign_agreement

    pc = load_xyz("/root/reference/data/ok.xyz")[:n_points]
    pc_n, _ = Transform.trans(pc)
    r = np.random.default_rng(seed)
    scr = pc_n.copy()
    scr[r.random(len(scr)) < 0.5, 3:6] *= -1

    # --- reference run (torch CPU) ---
    tpc = torch.tensor(scr.copy())
    t0 = time.perf_counter()
    out_ref = ref_field_utils.strongest_field_propagation_points(
        tpc, diffuse=True, starting_point=0
    )
    t_ref = time.perf_counter() - t0
    t0 = time.perf_counter()
    mp_ref = ref_field_utils.measure_mean_potential(out_ref)
    t_ref_pot = time.perf_counter() - t0
    out_ref = out_ref.numpy().copy()
    if float(mp_ref) < 0:
        out_ref[:, 3:6] *= -1

    # --- dipole_tpu run ---
    t0 = time.perf_counter()
    out_tpu = propagate.strongest_field_propagation_points(scr, diffuse=True)
    t_tpu_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    out_tpu = propagate.strongest_field_propagation_points(scr, diffuse=True)
    t_tpu = time.perf_counter() - t0
    t0 = time.perf_counter()
    mp_tpu = fields.measure_mean_potential(out_tpu)
    t_tpu_pot = time.perf_counter() - t0
    if mp_tpu < 0:
        out_tpu[:, 3:6] *= -1

    agree = sign_agreement(out_ref, out_tpu)
    print(f"n={n_points}")
    print(f"reference propagation: {t_ref:.2f}s, potential: {t_ref_pot:.3f}s, mean_pot={float(mp_ref):+.4f}")
    print(f"dipole_tpu propagation: first {t_tpu_first:.2f}s, warm {t_tpu:.2f}s, potential {t_tpu_pot:.3f}s, mean_pot={mp_tpu:+.4f}")
    print(f"sign agreement (ours vs reference): {agree:.6f}")
    print(f"speedup (warm): {t_ref / t_tpu:.1f}x")
    return agree


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10000
    main(n)
