"""Runnable replacement for the reference's three exploration notebooks
(SURVEY C44: ana_patch.ipynb, run.ipynb, vis_field.ipynb) — every workflow
as a script over the shipped demo data, no notebook runtime needed.

  1. ana_patch: orient segments of a GT cloud, log per-segment metrics to
     res<i>.ply + reslog.json, reload through analysis.get_segs, and print
     the self-interaction-energy vs GT-error table (the notebook's scatter
     data; reference ana_patch.ipynb cells 1-5, analysis.py:7-30).
  2. run: batch-convert .ply results back to .xyz (reference run.ipynb
     cell 2's ply2xyz) via tools/convert.py.
  3. vis_field: dipole-potential cross-section + marching-tetrahedra
     isosurface .ply of the oriented cloud (reference vis_field.ipynb,
     vis_field.py:11-138).

Usage: python tools/analysis_walkthrough.py [workdir]
"""
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(workdir="/tmp/dipole_tpu_walkthrough", n_segments=6,
         n_points=None):
    from dipole_tpu import analysis
    from dipole_tpu.ops import metrics, propagate
    from dipole_tpu.utils.io import Transform, load_xyz, write_ply
    from tools.convert import convert

    out = Path(workdir)
    out.mkdir(parents=True, exist_ok=True)

    # --- 1a. build an experiment folder: orient per-segment, log metrics ---
    gt = load_xyz("/root/reference/data/ok.xyz")
    if n_points:
        gt = gt[:: max(1, len(gt) // n_points)]
    pc, _ = Transform.trans(gt)
    rng = np.random.default_rng(0)
    order = np.argsort(pc[:, 0])               # coherent slabs along x
    node_log = []
    for i, idx in enumerate(np.array_split(order, n_segments)):
        seg_gt = pc[idx]
        seg = seg_gt.copy()
        seg[rng.random(len(seg)) < 0.5, 3:6] *= -1      # scramble signs
        oriented = propagate.strongest_field_propagation_points(seg,
                                                                diffuse=True)
        err = metrics.cal_nd_loss(oriented, seg_gt)
        write_ply(out / f"res{i}.ply", oriented[:, :3], oriented[:, 3:6])
        node_log.append({"id": i, "metric": float(err)})
    (out / "reslog.json").write_text(json.dumps({"node_log": node_log}))
    print(f"wrote {n_segments} segment results + reslog.json to {out}")

    # --- 1b. the ana_patch correlation table ---
    segs = analysis.get_segs(out)
    table = analysis.self_interaction_table(segs)
    print(f"\n{'id':>3} {'nd_loss':>9} {'self_int':>10} {'self_all':>10} "
          f"{'random':>10}")
    for row in table:
        print(f"{row['id']:>3} {row['metric']:>9.3f} "
              f"{float(row['self_interaction']):>10.3f} "
              f"{float(row['self_interaction_all']):>10.3f} "
              f"{float(row['random_self_interaction']):>10.3f}")
    x = np.array([r["metric"] for r in table])
    y = np.array([float(r["self_interaction_all"]) for r in table])
    if len(x) > 2 and x.std() > 0 and y.std() > 0:
        corr = float(np.corrcoef(x, y)[0, 1])
        print(f"corr(nd_loss, self_interaction_all) = {corr:+.3f} "
              "(the notebook's scatter relationship)")

    # --- 2. run.ipynb: ply -> xyz conversion of the results ---
    for i in range(n_segments):
        convert(out / f"res{i}.ply", out / f"res{i}.xyz")
    print(f"\nconverted {n_segments} .ply results to .xyz (run.ipynb ply2xyz)")

    # --- 3. vis_field.ipynb: cross-section + isosurface of the potential ---
    from dipole_tpu.vis import draw_field_isosurface, field_cross_section

    oriented_all = propagate.strongest_field_propagation_points(pc,
                                                                diffuse=True)
    field_cross_section(oriented_all, out / "potential_xsec.ply", axis=2,
                        n=48)
    verts, faces, _ = draw_field_isosurface(oriented_all,
                                            out / "potential_iso.ply",
                                            res=32, levels=6)
    print(f"potential cross-section + isosurface ({len(verts)} verts) "
          f"written to {out}")
    return table


if __name__ == "__main__":
    main(*sys.argv[1:2])
