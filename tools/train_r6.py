"""Round-4 from-scratch ensemble training, recipe 5: region-flip-heavy.

Where recipe 4 (gauge-free + full scramble, tools/train_r5.py) broke the
trivial-gauge collapse in pilots but drifted back at full schedule, this
recipe targets the distribution the net actually faces mid-pipeline.
Measured motivation (BASELINE round-4 training section):
  - the reference's own hands.pt scores only ~0.75 on fully scrambled
    patches — the reference nets are NOT scramble solvers;
  - the valuable behavior is fixing coherent minority REGIONS inside a
    mostly-correct patch (cascade states), plus sparse per-point noise;
  - recipe 2 had region flips at only p=0.25, so 75 % of samples were
    raw orient_center patches whose residual errors are ambiguous points
    the net cannot learn — that gradient noise drowned the learnable
    region task. Here region flips dominate (p~0.9, 1-3 draws).

Usage: python tools/train_r6.py pilot         # grid of short pilots
       python tools/train_r6.py full SEED ... # full-schedule models
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dipole_tpu import train  # noqa: E402
from dipole_tpu.models import checkpoints  # noqa: E402
from tools.train_r4 import r4_corpus  # noqa: E402
from tools.train_r5 import post_vote_diagnostic  # noqa: E402

OUT = Path("/tmp/dipole_tpu_ensemble_r6")
# Mid-pipeline states mined by tools/mine_hard_cases.py from ok + fandisk +
# 2 synthetic hand shapes (199 states, hand.xyz held out), shipped in-repo
# so the recipe is reproducible without re-mining (~2 h on this host).
MINED_DEFAULT = Path(__file__).resolve().parent.parent / \
    "train_data" / "mined_states_r4.npz"

# recipe grid: (name, dict of train_on_clouds overrides)
RECIPES = {
    "A": dict(region_flip=0.9, region_draws=2, point_flip=0.4, scramble=0.0,
              class_balance=True, gauge_free=True),
    "B": dict(region_flip=0.9, region_draws=2, point_flip=0.4, scramble=0.1,
              class_balance=True, gauge_free=True),
    "C": dict(region_flip=0.9, region_draws=2, point_flip=0.4, scramble=0.0,
              class_balance=True, gauge_free=False),
    "D": dict(region_flip=0.9, region_draws=3, point_flip=0.4, scramble=0.0,
              class_balance=False, gauge_free=True),
    # round-5 final-pass fixers: region sizes matched to the CONVERGED
    # pipeline's measured residue (5-27 % regions + sub-5 % tail,
    # tools/e2e_patch_diagnostic.py) instead of the mid-pipeline 5-50 %
    "E": dict(region_flip=0.9, region_draws=2, point_flip=0.4, scramble=0.0,
              class_balance=True, gauge_free=True, region_range=(0.02, 0.3)),
    "F": dict(region_flip=0.9, region_draws=2, point_flip=0.4, scramble=0.0,
              class_balance=True, gauge_free=False,
              region_range=(0.02, 0.3)),
    # G/H: E with precision bias — the last-pass fixer must never break a
    # correct point (keep_bias shifts class mass toward "keep")
    "G": dict(region_flip=0.9, region_draws=2, point_flip=0.4, scramble=0.0,
              class_balance=True, gauge_free=True, region_range=(0.02, 0.3),
              keep_bias=0.7),
    "H": dict(region_flip=0.9, region_draws=2, point_flip=0.4, scramble=0.0,
              class_balance=True, gauge_free=True, region_range=(0.02, 0.3),
              keep_bias=0.85),
}


def load_mined(path):
    """Load mined (patch, labels) pairs; supports the shipped pickle-free
    concatenated form (points/labels/lengths) and the miner's raw object
    arrays (patches/labels)."""
    z = np.load(path, allow_pickle=True)
    if "lengths" in z.files:
        off = np.concatenate([[0], np.cumsum(z["lengths"])])
        return [(z["points"][a:b], z["labels"][a:b])
                for a, b in zip(off[:-1], off[1:])]
    return list(zip(z["patches"], z["labels"]))


def run_one(name, recipe, steps, seed, data="/root/reference/data",
            mined=(), snapshot_every=0):
    corpus = r4_corpus()
    t0 = time.time()
    OUT.mkdir(exist_ok=True)
    snaps = []

    def snap(step, params):
        p = OUT / f"model_{name}{seed}_s{step}.pt"
        checkpoints.save_state_dict(
            {k: np.asarray(v) for k, v in params.items()}, p)
        p.with_suffix(".txt").write_text("pool: 0.6\n")
        snaps.append((step, p))

    params, _, eval_acc = train.train_on_clouds(
        corpus, steps=steps, batch=16, bucket=512, pool=0.6, seed=seed,
        eval_paths=[f"{data}/hand.xyz"], verbose=False,
        learning_rate=1e-3, extra_data=mined,
        snapshot_every=snapshot_every,
        snapshot_fn=snap if snapshot_every else None, **recipe)
    pt = OUT / f"model_{name}{seed}.pt"
    checkpoints.save_state_dict(
        {k: np.asarray(v) for k, v in params.items()}, pt)
    pt.with_suffix(".txt").write_text("pool: 0.6\n")
    # diagnose the schedule: late-drift shows as fix-rate decay over steps
    for step, p in snaps:
        if step == steps:
            continue
        agree, fix_rate, gf = post_vote_diagnostic([p])
        print(f"  {name}{seed} snapshot {step}: ok post-vote {agree:.4f} "
              f"gauge-free {gf:.4f} fix-rate {fix_rate:.4f}", flush=True)
    agree, fix_rate, gf = post_vote_diagnostic([pt])
    print(f"recipe {name} seed {seed}: {steps} steps in {time.time()-t0:.0f}s"
          f" held-out {eval_acc:.4f} | ok post-vote {agree:.4f} gauge-free "
          f"{gf:.4f} fix-rate {fix_rate:.4f} (init 0.757, ref bar 0.828)",
          flush=True)
    return pt, agree, gf, fix_rate


def main():
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    mined_path = MINED_DEFAULT if MINED_DEFAULT.exists() else None
    recipes = list(RECIPES)
    for a in sys.argv[1:]:
        if a == "--mined=none":
            mined_path = None
        elif a.startswith("--mined="):
            mined_path = a.split("=", 1)[1]
        elif a.startswith("--recipes="):
            recipes = a.split("=", 1)[1].split(",")
    mined = []
    if mined_path:
        for mp in str(mined_path).split(","):
            mined.extend(load_mined(mp))
        print(f"mined states: {len(mined)} ({mined_path})", flush=True)
    mode = argv[0] if argv else "pilot"
    if mode == "pilot":
        steps = int(argv[1]) if len(argv) > 1 else 800
        for name in recipes:
            run_one(name, RECIPES[name], steps, seed=20, mined=mined)
    else:  # full NAME STEPS SEED [SEED...]
        name = argv[1]
        steps = int(argv[2])
        seeds = [int(s) for s in argv[3:]] or [30]
        pts = [run_one(name, RECIPES[name], steps, s, mined=mined,
                       snapshot_every=800)[0]
               for s in seeds]
        if len(pts) > 1:
            agree, fix_rate, gf = post_vote_diagnostic(pts)
            print(f"ensemble of {len(pts)}: ok post-vote {agree:.4f} "
                  f"gauge-free {gf:.4f} fix-rate {fix_rate:.4f}", flush=True)


if __name__ == "__main__":
    main()
