"""Per-patch vote quality diagnostic (VERDICT r3 item 2 groundwork).

The from-scratch ensembles collapse on ok (0.80 end-to-end) while new3a
holds 0.9736 — this tool localizes WHERE the votes go wrong. It replays the
demo patch pipeline up to the first ensemble pass (estimate -> Transform ->
voxel patches -> curvature filter -> orient_center) and then, for each
candidate ensemble, applies one vote per patch and scores the result
against GT per patch. Patches where an ensemble's post-vote agreement is
far below the best achievable (max(agree, 1-agree) of the init) are the
failure sites.

Usage: python tools/vote_diagnostic.py [shape] [ensemble ...]
  ensemble = preset name (ref3, old3, new3a, new3b, new6) or
             comma-separated checkpoint paths.
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
PRESETS = {
    "ref3": [str(REF / "pre_trained" / f"{n}.pt")
             for n in ("hands2", "hands", "manmade")],
    "old3": [str(REPO / "pre_trained_tpu" / f"dipole_{i}.pt")
             for i in range(3)],
    "new3a": [f"/tmp/dipole_tpu_ensemble_r4/model_{s}.pt" for s in (3, 4, 5)],
    "new3b": [f"/tmp/dipole_tpu_ensemble_r4/model_{s}.pt" for s in (6, 7, 8)],
    "new6": [f"/tmp/dipole_tpu_ensemble_r4/model_{s}.pt"
             for s in range(3, 9)],
    # best zero-reference gauge ensemble (BASELINE r5: 0.9763/0.9754 at
    # --vote_margin 0.2) — the stage-1 models the final-pass fixers serve
    "pair": [str(REPO / "pre_trained_tpu" / "dipole_1.pt"),
             str(REPO / "pre_trained_tpu" / "dipole_0.pt")],
}


def pipeline_patches(shape: str):
    """(gt_normals_in_transform_frame, init_pc, patch_indices) with the
    demos/{shape}.sh flag set (parts=30, min=100, curvature=0.01)."""
    from dipole_tpu.ops.estimate import estimate_normals
    from dipole_tpu.ops.patching import divide_pc, fix_n_filter
    from dipole_tpu.utils.io import Transform, load_xyz, orient_center_np

    gt = load_xyz(REF / "data" / f"{shape}.xyz")
    gt, _ = Transform.trans(gt)
    est = estimate_normals(gt, max_nn=30)
    idxs = divide_pc(est[:, :3], 30, min_patch=100)
    patch_indices = fix_n_filter(est, idxs, 0.01)
    init = orient_center_np(est)
    return gt, init, patch_indices


def main(argv):
    shape = argv[0] if argv else "ok"
    names = argv[1:] or ["ref3", "old3", "new3a", "new6"]

    from dipole_tpu.models.inference import (ensemble_vote_patches,
                                             load_model_from_file)

    gt, init, patch_indices = pipeline_patches(shape)
    print(f"{shape}: {len(patch_indices)} patches "
          f"(sizes {[len(p) for _, p in patch_indices]})", flush=True)

    per_patch = {}
    for name in names:
        paths = PRESETS.get(name) or name.split(",")
        if any(not Path(p).exists() for p in paths):
            print(f"{name}: SKIP (missing checkpoints)", flush=True)
            continue
        models = [load_model_from_file(p) for p in paths]
        votes = ensemble_vote_patches(
            models, [init[pidx] for _, pidx in patch_indices])
        rows = []
        for (_, pidx), (flip, _probs) in zip(patch_indices, votes):
            n = init[pidx, 3:6].copy()
            n[flip] *= -1
            agree_init = float(
                ((init[pidx, 3:6] * gt[pidx, 3:6]).sum(-1) > 0).mean())
            agree = float(((n * gt[pidx, 3:6]).sum(-1) > 0).mean())
            best = max(agree_init, 1 - agree_init)
            rows.append((agree, best, len(pidx)))
        per_patch[name] = rows
        covered = sum(n for *_, n in rows)
        tot = sum(a * n for a, _, n in rows) / covered
        print(f"{name}: mean post-vote agreement {tot:.4f} over "
              f"{covered} pts", flush=True)

    if not per_patch:
        return
    ref = next(iter(per_patch))
    print(f"\nper-patch post-vote agreement (vs achievable):")
    hdr = "  ".join(f"{n:>7s}" for n in per_patch)
    print(f"{'patch':>5s} {'size':>5s} {'best':>6s}  {hdr}")
    n_patches = len(per_patch[ref])
    for i in range(n_patches):
        best = per_patch[ref][i][1]
        size = per_patch[ref][i][2]
        cells = "  ".join(f"{per_patch[n][i][0]:7.3f}" for n in per_patch)
        worst = min(per_patch[n][i][0] for n in per_patch)
        flag = "  <-- failure" if worst < 0.7 else ""
        print(f"{i:5d} {size:5d} {best:6.3f}  {cells}{flag}")


if __name__ == "__main__":
    main(sys.argv[1:])
