"""Measure fixer checkpoints ON the converged pipeline state (round 5).

The staged fix pass only helps if, at the state it actually runs on
(post vote-loop, demo config), wrong points receive systematically lower
P(flip) than right points. This probe runs the real pipeline with
fix_margin=0.49 (so the pass records probabilities but flips ~nothing),
then scores every candidate policy OFFLINE against GT:

  per fixer and per margin: fixed (wrong points that would flip) vs
  broken (right points that would flip), plus combined 'all'/'mean'
  votes — the (fixed - broken) column is the net e2e value of the pass
  BEFORE propagation effects.

Usage: python tools/fixer_probe.py shape fixer[,fixer...]
       [--gauge=ckpt,ckpt] [--margin=0.2]
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF = Path("/root/reference")
PT = Path(__file__).resolve().parent.parent / "pre_trained_tpu"


def main(argv):
    shape = argv[0]
    fixers = argv[1].split(",")
    gauge = [str(PT / "dipole_1.pt"), str(PT / "dipole_0.pt")]
    margin = 0.2
    for a in argv[2:]:
        if a.startswith("--gauge="):
            gauge = a.split("=", 1)[1].split(",")
        elif a.startswith("--margin="):
            margin = float(a.split("=", 1)[1])

    from dipole_tpu import api
    from dipole_tpu.models.inference import load_model_from_file
    from dipole_tpu.utils.io import Transform, load_xyz

    gt = load_xyz(REF / "data" / f"{shape}.xyz")
    stats: dict = {}
    api.orient_patches(
        gt[:, :3], models=[load_model_from_file(p) for p in gauge],
        iters=10, propagation_iters=5, number_parts=30,
        minimum_points_per_patch=100, curvature_threshold=0.01,
        diffuse=True, weighted_prop=True, estimate=True,
        vote_margin=margin,
        fix_models=[load_model_from_file(p) for p in fixers],
        fix_margin=0.49, fix_when="last", fix_vote="all",
        fix_stats=stats)

    # GT normals in the pipeline's transform frame (Transform only
    # translates/scales xyz; normals are unchanged)
    gt_n = gt[:, 3:6]
    records = stats["passes"][-1]
    names = [Path(f).name.replace(".pt", "").replace("dipole_r5_", "")
             for f in fixers]

    # per-point ground truth at the recorded state
    wrong_all, probs_cols = [], [[] for _ in fixers]
    for r in records:
        agree = (r["normals"] * gt_n[r["pidx"]]).sum(-1) > 0
        wrong_all.append(~agree)
        for c, pm in zip(probs_cols, r["probs_by_model"]):
            c.append(np.asarray(pm))
    wrong = np.concatenate(wrong_all)
    cols = [np.concatenate(c) for c in probs_cols]
    n_wrong, n_right = int(wrong.sum()), int((~wrong).sum())
    print(f"{shape}: converged state has {n_wrong} wrong / "
          f"{n_right} right points in {len(records)} patches")

    for name, p in zip(names, cols):
        qs = np.quantile(p[wrong], [0.1, 0.5, 0.9])
        qr = np.quantile(p[~wrong], [0.1, 0.5, 0.9])
        print(f"  {name}: P(flip) wrong q10/50/90 = "
              f"{qs[0]:.3f}/{qs[1]:.3f}/{qs[2]:.3f}   right = "
              f"{qr[0]:.3f}/{qr[1]:.3f}/{qr[2]:.3f}")

    def table(label, p):
        print(f"  {label}: margin  fixed  broken  net")
        for m in (0.1, 0.2, 0.3, 0.4, 0.45):
            f = p < (0.5 - m)
            print(f"    {m:4.2f}  {int((f & wrong).sum()):6d} "
                  f"{int((f & ~wrong).sum()):6d} "
                  f"{int((f & wrong).sum()) - int((f & ~wrong).sum()):6d}")

    for name, p in zip(names, cols):
        table(f"single {name}", p)
    if len(cols) > 1:
        table("all (unanimity)", np.max(cols, axis=0))
        table("mean", np.mean(cols, axis=0))


if __name__ == "__main__":
    main(sys.argv[1:])
