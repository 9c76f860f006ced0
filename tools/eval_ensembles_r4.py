"""Evaluate candidate from-scratch ensembles END-TO-END on hand + ok
(VERDICT r3 item 2: selection by end-to-end accuracy, not patch accuracy).

Runs api.orient_patches with the exact demos/hand.sh / demos/ok.sh flag sets
(iters 10, prop 5, parts 30, min 100, curvature 0.01, estimate_normals) for
each named ensemble and prints the GT sign agreement. All candidates are
first-party checkpoints — no reference weights anywhere.

Usage: python tools/eval_ensembles_r4.py [combo ...]
  combo = comma-separated checkpoint paths, or a named preset below.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

REPO = Path(__file__).resolve().parent.parent
DATA = Path("/root/reference/data")
OLD = [REPO / "pre_trained_tpu" / f"dipole_{i}.pt" for i in range(3)]
NEW = [Path("/tmp/dipole_tpu_ensemble_r4") / f"model_{s}.pt"
       for s in range(3, 9)]

PRESETS = {
    "old3": OLD,
    "new6": NEW,
    "new3a": NEW[:3],
    "new3b": NEW[3:],
    "mix6a": OLD + NEW[:3],
    "mix6b": OLD + NEW[3:],
    "all9": OLD + NEW,
}


def evaluate(models, shapes=("hand", "ok")):
    from dipole_tpu import api
    from dipole_tpu.ops import metrics
    from dipole_tpu.utils.io import load_xyz

    out = {}
    for shape in shapes:
        gt = load_xyz(DATA / f"{shape}.xyz")
        t0 = time.time()
        res = api.orient_patches(
            gt[:, :3], models=[str(m) for m in models], iters=10,
            propagation_iters=5, number_parts=30,
            minimum_points_per_patch=100, curvature_threshold=0.01,
            diffuse=True, weighted_prop=True, estimate=True)
        agree = metrics.sign_agreement(np.asarray(res), gt)
        out[shape] = agree
        print(f"  {shape}: {agree:.4f}  ({time.time()-t0:.0f}s)", flush=True)
    return out


def main(argv):
    names = argv or ["new6", "mix6a", "all9", "old3"]
    results = {}
    for name in names:
        models = PRESETS.get(name)
        if models is None:
            models = [Path(p) for p in name.split(",")]
        missing = [m for m in models if not Path(m).exists()]
        if missing:
            print(f"{name}: SKIP (missing {missing})", flush=True)
            continue
        print(f"{name} ({len(models)} models):", flush=True)
        results[name] = evaluate(models)
    print("\nsummary:")
    for name, r in results.items():
        print(f"  {name}: " + "  ".join(f"{k}={v:.4f}" for k, v in r.items()))


if __name__ == "__main__":
    main(sys.argv[1:])
