"""Round-4 from-scratch ensemble training (VERDICT r3 item 2).

Goal: an ensemble containing ZERO reference pre_trained/*.pt weights with
hand >= 0.985 and ok >= 0.986 end-to-end GT sign agreement. Levers from the
verdict: larger synthetic corpus (more hand-category articulation), longer
schedule, and ensemble selection by END-TO-END accuracy (done separately in
tools/eval_ensembles_r4.py).

Trains `n_models` fresh models (seeds start..start+n-1) on the widened
corpus and saves each as a torch-compatible .pt + sidecar .txt.

Usage: python tools/train_r4.py [steps] [n_models] [outdir] [start_seed]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dipole_tpu import train  # noqa: E402
from dipole_tpu.models import checkpoints  # noqa: E402
from tools.train_demo import _eval_checkpoints_on_hand  # noqa: E402


def r4_corpus(tmpdir="/tmp/dipole_tpu_train_shapes"):
    """The round-2 corpus widened with 6 more articulated-hand shapes and
    2 more metaball chains (VERDICT r3: 'more hand-category articulation').
    The real hand.xyz stays fully held out."""
    from tools import make_shape

    data = "/root/reference/data"
    tmpdir = Path(tmpdir)
    tmpdir.mkdir(exist_ok=True)
    specs = [("lion", 40000, 77), ("vase", 40000, 78), ("alien", 40000, 79),
             ("blobs", 30000, 101), ("blobs", 30000, 102),
             ("blobs", 30000, 103), ("blobs", 30000, 104),
             ("blobs", 30000, 105), ("blobs", 30000, 106),
             ("hand", 30000, 201), ("hand", 30000, 202),
             ("hand", 30000, 203), ("hand", 30000, 204),
             ("hand", 30000, 205), ("hand", 30000, 206),
             ("hand", 30000, 207), ("hand", 30000, 208),
             ("hand", 30000, 209), ("hand", 30000, 210)]
    out = [(f"{data}/fandisk.xyz", (20, 30, 45)),
           (f"{data}/ok.xyz", (20, 30, 45))]
    for shape, n, seed in specs:
        path = tmpdir / f"{shape}_{seed}_{n}.xyz"
        if not path.exists():
            make_shape.main([shape, str(n), str(path), str(seed)])
        out.append((str(path), (45, 64)))
    return out


def main(steps=3200, n_models=6, outdir="/tmp/dipole_tpu_ensemble_r4",
         start_seed=3, pool=0.6):
    data = "/root/reference/data"
    outdir = Path(outdir)
    outdir.mkdir(exist_ok=True)
    corpus = r4_corpus()
    print(f"corpus: {len(corpus)} clouds", flush=True)

    pts = []
    for seed in range(start_seed, start_seed + n_models):
        t0 = time.time()
        params, _, eval_acc = train.train_on_clouds(
            corpus, steps=steps, batch=16, bucket=512, pool=pool, seed=seed,
            eval_paths=[f"{data}/hand.xyz"], verbose=False,
            learning_rate=1e-3,
        )
        pt = outdir / f"model_{seed}.pt"
        checkpoints.save_state_dict(
            {k: np.asarray(v) for k, v in params.items()}, pt)
        pt.with_suffix(".txt").write_text(f"pool: {pool}\n")
        pts.append(pt)
        print(f"seed {seed}: {steps} steps in {time.time()-t0:.0f}s, "
              f"held-out acc {eval_acc:.4f} -> {pt}", flush=True)

    accs, ens_acc = _eval_checkpoints_on_hand(pts)
    for p, a in zip(pts, accs):
        print(f"{p.name}: gauge-free held-out acc {a:.4f}", flush=True)
    print(f"ENSEMBLE ({n_models} new models): gauge-free acc {ens_acc:.4f}",
          flush=True)


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 3200
    n_models = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    outdir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/dipole_tpu_ensemble_r4"
    start = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    main(steps, n_models, outdir, start)
