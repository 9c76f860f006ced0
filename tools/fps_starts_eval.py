"""Measure FPS-start policies end-to-end across the demo suite (VERDICT r4
item 1: re-select the deterministic ensemble fixed point on evidence).

Runs api.orient_patches with the exact demos/{hand,ok,fandisk}.sh flag sets
for each (ensemble, fps_starts) combo and prints GT sign agreement. The
'rng' policy is the shipped digest-keyed deterministic draw; 'centroid' is
the geometry-derived patch-centroid-nearest start (pointcnn.centroid_starts).

Usage: python tools/fps_starts_eval.py [shape ...] [--models trio|mix]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

REF = Path("/root/reference")
REPO = Path(__file__).resolve().parent.parent
TRIO = [str(REF / "pre_trained" / f"{n}.pt")
        for n in ("hands2", "hands", "manmade")]
MIX = TRIO + [str(REPO / "pre_trained_tpu" / f"dipole_{i}.pt")
              for i in range(3)]


def evaluate(shape: str, models, fps_starts: str) -> float:
    from dipole_tpu import api
    from dipole_tpu.ops import metrics
    from dipole_tpu.utils.io import load_xyz

    gt = load_xyz(REF / "data" / f"{shape}.xyz")
    res = api.orient_patches(
        gt[:, :3], models=models, iters=10, propagation_iters=5,
        number_parts=30, minimum_points_per_patch=100,
        curvature_threshold=0.01, diffuse=True, weighted_prop=True,
        estimate=True, fps_starts=fps_starts)
    return metrics.sign_agreement(np.asarray(res), gt)


def main(argv):
    shapes = [a for a in argv if not a.startswith("--")] or \
        ["hand", "ok", "fandisk"]
    models = MIX if "--models=mix" in argv else TRIO
    name = "mix6" if models is MIX else "trio"
    results = {}
    for shape in shapes:
        for policy in ("centroid", "rng"):
            t0 = time.time()
            agree = evaluate(shape, models, policy)
            results[(shape, policy)] = agree
            print(f"{name} {shape} fps_starts={policy}: {agree:.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    print("\nsummary:")
    for (shape, policy), v in sorted(results.items()):
        print(f"  {name} {shape:8s} {policy:8s} {v:.4f}")


if __name__ == "__main__":
    main(sys.argv[1:])
