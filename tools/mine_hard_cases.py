"""Mine mid-pipeline patch states for training (VERDICT r3 item 2 lever:
"hard-case mining from the pipeline's own wrong points").

Replays the patch pipeline (reference orient_pointcloud.py:11-83 shape:
voxel patches -> curvature filter -> orient_center -> iterate {ensemble
vote, periodic patch propagation}) on GROUND-TRUTH-oriented clouds with a
given ensemble, and captures each patch's state (points + current normals)
as the ensemble is about to see it, labeled per point by GT agreement.
These are exactly the inference-time inputs — including the cascade
states a propagation pass hands the net mid-pipeline, which no synthetic
augmentation reproduces faithfully.

Saved as an .npz of object arrays {patches: [(n,6) f32], labels: [(n,) i32]}
consumable by train.train_on_clouds(extra_data=...).

Usage: python tools/mine_hard_cases.py OUT.npz [ensemble-preset] [cloud...]
       cloud entries may carry a patch-grid override as PATH:NPARTS
       (synthetic 30-40k clouds need finer grids than the 10k demos);
       --iters=N bounds the vote/cascade replay (11 covers two cascade
       captures and is what the round-4 mining runs used on CPU).
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def mine_cloud(path, models, iters=30, propagation_iters=10,
               number_parts=30, min_patch=100, curvature=0.01, seed=1,
               keep_clean_frac=0.15, rng=None):
    import jax

    from dipole_tpu.models.inference import ensemble_vote_patches
    from dipole_tpu.ops import propagate
    from dipole_tpu.ops.estimate import estimate_normals
    from dipole_tpu.ops.patching import divide_pc, fix_n_filter
    from dipole_tpu.utils.io import (Transform, load_point_cloud,
                                     orient_center_np)
    from dipole_tpu.train import _canonical_labels

    rng = rng or np.random.default_rng(seed)
    gt = load_point_cloud(path)
    gt, _ = Transform.trans(gt)
    est = estimate_normals(gt, max_nn=30)
    all_patches = divide_pc(est[:, :3], number_parts, min_patch=min_patch)
    patch_indices = fix_n_filter(est, all_patches, curvature)
    pc = est.copy()
    for _, p in patch_indices:
        pc[p] = orient_center_np(pc[p])

    out_p, out_l = [], []

    def capture():
        for _, pidx in patch_indices:
            lab = ((pc[pidx, 3:6] * gt[pidx, 3:6]).sum(-1) > 0).astype(
                np.int32)
            minority = min(lab.mean(), 1 - lab.mean())
            # the informative states are patches with real coherent errors;
            # keep a floor of clean ones so "do nothing" stays represented
            if minority >= 0.02 or rng.random() < keep_clean_frac:
                out_p.append(pc[pidx].astype(np.float32))
                out_l.append(_canonical_labels(lab))

    key = jax.random.PRNGKey(seed)
    capture()  # iteration-0 state (orient_center init)
    for it in range(iters):
        if models and patch_indices:
            key, sub = jax.random.split(key)
            votes = ensemble_vote_patches(
                models, [pc[pidx] for _, pidx in patch_indices], key=sub)
            for (_, pidx), (flip, _probs) in zip(patch_indices, votes):
                pc[pidx[flip], 3:6] *= -1
        if it % propagation_iters == 0 and it != 0:
            pc = propagate.strongest_field_propagation_patches(
                pc, patch_indices, all_patches, diffuse=True)
            capture()  # post-cascade state: what the next vote pass sees
    return out_p, out_l


def main():
    from dipole_tpu.models.inference import load_model_from_file
    from tools.train_r4 import r4_corpus
    from tools.vote_diagnostic import PRESETS

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    iters = 30
    for a in sys.argv[1:]:
        if a.startswith("--iters="):
            iters = int(a.split("=", 1)[1])
    out = args[0] if args else "/tmp/hard_cases.npz"
    preset = args[1] if len(args) > 1 else "old3"
    clouds = args[2:]
    models = [load_model_from_file(p) for p in PRESETS[preset]]
    if not clouds:
        clouds = [p if isinstance(p, str) else p[0] for p in r4_corpus()]
    P, L = [], []
    for c in clouds:
        c, _, parts = c.partition(":")
        p, l = mine_cloud(c, models, iters=iters,
                          number_parts=int(parts) if parts else 30)
        stats = [min(x.mean(), 1 - x.mean()) for x in l]
        print(f"{c}: {len(p)} states, minority frac mean "
              f"{np.mean(stats):.3f}", flush=True)
        P.extend(p)
        L.extend(l)
    np.savez(out, patches=np.array(P, dtype=object),
             labels=np.array(L, dtype=object), allow_pickle=True)
    print(f"saved {len(P)} states -> {out}")


if __name__ == "__main__":
    main()
