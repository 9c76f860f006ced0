"""Measure the ensemble --models ORDERING spread on the hand demo
(VERDICT r2 item 2 'done' criterion).

Round 2 found per-model PRNG keys folded over the model-list INDEX, making
the model order a hidden RNG knob (hand GT agreement swung 0.9400-0.9834
across orderings of the shipped trio). models/inference._model_key now
folds a content digest of each checkpoint instead, so reordering --models
must not move results. This runs the exact demos/hand.sh config with the
6-model mix (3 reference + 3 first-party checkpoints) under several
orderings and prints the per-ordering GT agreement + the spread, for the
BASELINE.md table.

Usage: python tools/ordering_spread.py [--orderings 3] [--cpu]
"""
import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF = Path("/root/reference")
MIX = [
    REF / "pre_trained/hands2.pt",
    REF / "pre_trained/hands.pt",
    REF / "pre_trained/manmade.pt",
    Path(__file__).resolve().parent.parent / "pre_trained_tpu/dipole_0.pt",
    Path(__file__).resolve().parent.parent / "pre_trained_tpu/dipole_1.pt",
    Path(__file__).resolve().parent.parent / "pre_trained_tpu/dipole_2.pt",
]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--orderings", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (for TPU-tunnel outages)")
    args = ap.parse_args(argv)
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    from dipole_tpu import api
    from dipole_tpu.ops.metrics import sign_agreement

    gt = np.loadtxt(REF / "data/hand.xyz").astype(np.float32)

    rng = np.random.default_rng(7)
    orders = [list(range(len(MIX)))]
    while len(orders) < args.orderings:
        p = list(rng.permutation(len(MIX)))
        if p not in orders:
            orders.append(p)

    agrees = []
    for oi, perm in enumerate(orders):
        models = [str(MIX[i]) for i in perm]
        t0 = time.time()
        out = api.orient_patches(
            gt[:, :3], models=models, iters=10, propagation_iters=5,
            number_parts=30, minimum_points_per_patch=100,
            curvature_threshold=0.01, diffuse=True, weighted_prop=True,
            estimate=True, n=30,
        )
        a = sign_agreement(out, gt)
        agrees.append(a)
        print(f"ordering {oi} {[MIX[i].stem for i in perm]}: "
              f"GT agreement {a:.4f}  ({time.time()-t0:.0f}s)")
    print(f"\nspread over {len(orders)} orderings: "
          f"{min(agrees):.4f} - {max(agrees):.4f} "
          f"(width {max(agrees)-min(agrees):.4f})")


if __name__ == "__main__":
    main()
