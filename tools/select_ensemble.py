"""Greedy end-to-end ensemble selection (VERDICT r3 item 2 lever:
"ensemble selection by end-to-end (not patch) accuracy").

Candidate checkpoints are scored as ensembles through the REAL demo
pipeline (api.orient_patches with the demos/hand.sh flag set) on the
shapes that gate the target (hand, ok), and the subset is grown greedily:
start from the best single model, add whichever candidate raises the
min(hand, ok) end-to-end score, stop when nothing improves. This directly
optimizes the deployment metric — per-patch accuracy provably does not
rank ensembles (BASELINE round-4 table: new6 beats new3a per-patch yet
loses 0.80 vs 0.97 on ok end-to-end).

Usage: python tools/select_ensemble.py CKPT... [--shapes=hand,ok]
       python tools/select_ensemble.py @preset... (vote_diagnostic presets)
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF = Path("/root/reference")


CACHE_PATH = Path("/tmp/select_ensemble_cache.json")


def _digest(pts):
    import hashlib

    h = hashlib.sha256()
    # content digest, order-free (voting is order-invariant by design)
    for d in sorted(hashlib.sha256(Path(p).read_bytes()).hexdigest()
                    for p in pts):
        h.update(d.encode())
    return h.hexdigest()[:24]


def end_to_end(pts, shape, margin=0.0, fix_pts=(), fix_margin=0.25,
               fix_when="last", fix_vote="all", fps_starts="rng",
               cache={}):
    """GT sign agreement of the ensemble on the demo config for shape.
    Scores persist in a content-digest-keyed disk cache: the pipeline is
    deterministic (digest-keyed FPS starts), so a combo never needs to be
    re-run across processes. margin: vote_margin to run the pipeline with
    (part of the cache key when nonzero). The JAX backend is part of the
    key: the cascade is numerically chaotic across backends (measured
    2026-08-19: the same pair scored ok 0.9536 on TPU vs 0.7990 on CPU),
    so a CPU-computed score must never answer a TPU query."""
    import json

    import jax

    from dipole_tpu import api
    from dipole_tpu.models.inference import load_model_from_file
    from dipole_tpu.utils.io import load_xyz

    key = (tuple(pts), shape, margin, tuple(fix_pts), fix_margin,
           fix_when, fix_vote, fps_starts)
    if key in cache:
        return cache[key]
    dkey = (f"{_digest(pts)}:{shape}:{jax.default_backend()}" +
            (f":m{margin}" if margin else "") +
            (f":fix{_digest(fix_pts)}:fm{fix_margin}"
             f":fw{fix_when}:fv{fix_vote}" if fix_pts else "") +
            (f":fs{fps_starts}" if fps_starts != "rng" else ""))
    disk = {}
    if CACHE_PATH.exists():
        disk = json.loads(CACHE_PATH.read_text())
        if dkey in disk:
            cache[key] = disk[dkey]
            return disk[dkey]
    gt = load_xyz(REF / "data" / f"{shape}.xyz")
    models = [load_model_from_file(str(p)) for p in pts]
    out = api.orient_patches(
        gt[:, :3], models=models, iters=10, propagation_iters=5,
        number_parts=30, minimum_points_per_patch=100,
        curvature_threshold=0.01, diffuse=True, weighted_prop=True,
        estimate=True, vote_margin=margin, fps_starts=fps_starts,
        fix_models=[load_model_from_file(str(p)) for p in fix_pts],
        fix_margin=fix_margin, fix_when=fix_when, fix_vote=fix_vote,
        timer=lambda *_a, **_k: _Null())
    agree = float(((out[:, 3:6] * gt[:, 3:6]).sum(-1) > 0).mean())
    cache[key] = agree
    if CACHE_PATH.exists():  # re-read: don't clobber concurrent writers
        disk = json.loads(CACHE_PATH.read_text())
    disk[dkey] = agree
    CACHE_PATH.write_text(json.dumps(disk, indent=0))
    return agree


class _Null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def score(pts, shapes, margin=0.0, fix_pts=(), fix_margin=0.25,
          fix_when="last", fix_vote="all", fps_starts="rng"):
    s = {sh: end_to_end(pts, sh, margin, fix_pts, fix_margin,
                        fix_when, fix_vote, fps_starts)
         for sh in shapes}
    return min(s.values()), s


def main():
    from tools.vote_diagnostic import PRESETS

    shapes = ["hand", "ok"]
    cands = []
    base = []
    margin = 0.0
    for a in sys.argv[1:]:
        if a.startswith("--shapes="):
            shapes = a.split("=", 1)[1].split(",")
        elif a.startswith("--base="):
            base = a.split("=", 1)[1].split(",")
        elif a.startswith("--margin="):
            margin = float(a.split("=", 1)[1])
        elif a.startswith("@"):
            cands.extend(PRESETS[a[1:]])
        else:
            cands.append(a)
    if not cands and not base:
        print(__doc__)
        return

    singles = []
    for c in cands:
        m, s = score([c], shapes, margin)
        print(f"single {Path(c).name}: " +
              " ".join(f"{k}={v:.4f}" for k, v in s.items()), flush=True)
        singles.append((m, c))
    singles.sort(reverse=True)
    chosen = list(base) if base else [singles[0][1]]
    best, bs = score(chosen, shapes, margin)
    print(f"start {'+'.join(Path(c).name for c in chosen)}: min={best:.4f} " +
          " ".join(f"{k}={v:.4f}" for k, v in bs.items()), flush=True)
    # steepest ascent: each round, evaluate every remaining candidate and
    # add the argmax (first-improvement greedy measurably stops early on
    # this landscape — ok moves in ~0.15 jumps when a cascade tips)
    improved = True
    while improved:
        improved = False
        round_best = None
        for _, c in singles:
            if c in chosen:
                continue
            m, s = score(chosen + [c], shapes, margin)
            print(f"  try +{Path(c).name}: min={m:.4f} " +
                  " ".join(f"{k}={v:.4f}" for k, v in s.items()), flush=True)
            if round_best is None or m > round_best[0]:
                round_best = (m, s, c)
        if round_best and round_best[0] > best:
            best, bs, c = round_best
            chosen.append(c)
            improved = True
            print(f"  += {Path(c).name} -> min={best:.4f}", flush=True)
    print("chosen:", [str(c) for c in chosen])
    print("scores:", " ".join(f"{k}={v:.4f}" for k, v in bs.items()),
          f"min={best:.4f}", f"margin={margin}")


if __name__ == "__main__":
    main()
