"""Localize WHERE an ensemble's end-to-end loss sits (round-5).

Runs the REAL demo pipeline (select_ensemble's exact orient_patches
config) for a given ensemble, then scores the FINAL output per patch
(same patching as the pipeline: estimate -> Transform -> divide_pc ->
fix_n_filter) plus the unpatched remainder. Distinguishes the two very
different failure modes the vote can have:
  - a patch at ~0..20 % agreement = wrong GAUGE (keep/flip-all error);
  - a patch at ~80-95 % = per-point residue (fixer territory).

Usage: python tools/e2e_patch_diagnostic.py shape ckpt[,ckpt...] [margin]
       [--fix=ckpt,ckpt] [--fix_margin=0.3] [--save=path.xyz]
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF = Path("/root/reference")


def main(argv):
    shape = argv[0]
    pts = argv[1].split(",")
    margin = 0.0
    fix: list = []
    fix_margin = 0.3
    fix_when = "last"
    fix_vote = "all"
    save = None
    for a in argv[2:]:
        if a.startswith("--fix="):
            fix = a.split("=", 1)[1].split(",")
        elif a.startswith("--fix_margin="):
            fix_margin = float(a.split("=", 1)[1])
        elif a.startswith("--fix_when="):
            fix_when = a.split("=", 1)[1]
        elif a.startswith("--fix_vote="):
            fix_vote = a.split("=", 1)[1]
        elif a.startswith("--save="):
            save = a.split("=", 1)[1]
        else:
            margin = float(a)

    from dipole_tpu import api
    from dipole_tpu.models.inference import load_model_from_file
    from dipole_tpu.ops.estimate import estimate_normals
    from dipole_tpu.ops.patching import divide_pc, fix_n_filter
    from dipole_tpu.utils.io import Transform, load_xyz

    gt = load_xyz(REF / "data" / f"{shape}.xyz")
    out = api.orient_patches(
        gt[:, :3], models=[load_model_from_file(p) for p in pts],
        iters=10, propagation_iters=5, number_parts=30,
        minimum_points_per_patch=100, curvature_threshold=0.01,
        diffuse=True, weighted_prop=True, estimate=True,
        vote_margin=margin,
        fix_models=[load_model_from_file(p) for p in fix],
        fix_margin=fix_margin, fix_when=fix_when, fix_vote=fix_vote)
    if save:
        np.savetxt(save, out, fmt="%.6f")

    ok = (out[:, 3:6] * gt[:, 3:6]).sum(-1) > 0
    print(f"{shape} total agreement {ok.mean():.4f} "
          f"({int((~ok).sum())} wrong of {len(ok)})")

    # reproduce the pipeline's patching on the same input
    est, _ = Transform.trans(estimate_normals(gt[:, :3], max_nn=30))
    all_patches = divide_pc(est[:, :3], 30, min_patch=100)
    patch_indices = fix_n_filter(est, all_patches, 0.01)
    covered = np.zeros(len(gt), bool)
    rows = []
    for _, pidx in patch_indices:
        covered[pidx] = True
        rows.append((float(ok[pidx].mean()), int((~ok[pidx]).sum()),
                     len(pidx)))
    rows.sort()
    print(f"{len(patch_indices)} filtered patches "
          f"({int(covered.sum())} pts) + {int((~covered).sum())} "
          f"unpatched pts (agreement {ok[~covered].mean():.4f}, "
          f"{int((~ok[~covered]).sum())} wrong)")
    print("worst patches (agree, wrong, size):")
    for agree, wrong, size in rows[:12]:
        tag = ("GAUGE" if agree < 0.5 else
               "region" if agree < 0.97 else "")
        print(f"  {agree:7.4f} {wrong:5d} {size:5d}  {tag}")
    lost_gauge = sum(w for a, w, _ in rows if a < 0.5)
    lost_region = sum(w for a, w, _ in rows if 0.5 <= a < 1.0)
    print(f"wrong-point budget: gauge-flipped patches {lost_gauge}, "
          f"per-point residue {lost_region}, unpatched "
          f"{int((~ok[~covered]).sum())}")


if __name__ == "__main__":
    main(sys.argv[1:])
