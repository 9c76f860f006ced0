"""Large-cloud orientation via representative points per patch.

Pipeline parity with reference orient_large.py:10-90: normalize -> optional
normal estimation -> voxel patches -> curvature filter -> orient_center ->
<=500 random representatives per patch -> PointCNN ensemble on reps only
(opts.iters passes) -> representative-point strongest-field propagation
(diffuse) -> lattice sign fix -> export."""
from __future__ import annotations

from pathlib import Path

import numpy as np

from dipole_tpu.ops import fields, propagate
from dipole_tpu.ops.estimate import estimate_normals
from dipole_tpu.ops.patching import divide_pc, fix_n_filter
from dipole_tpu.models.inference import ensemble_vote_patches, load_model_from_file
from dipole_tpu.utils import config
from dipole_tpu.utils.io import Transform, export_pc, load_xyz, orient_center_np
from dipole_tpu.utils.timing import timer_factory

MAX_PATCH_SIZE = 500  # representatives per patch (reference orient_large.py:14)


def run(opts):
    import jax

    MyTimer = timer_factory()
    export_path = Path(opts.export_dir)
    export_path.mkdir(exist_ok=True, parents=True)

    with MyTimer("load point cloud", count=False):
        input_pc = load_xyz(opts.pc, append_normals=False)
    print(input_pc.shape)

    input_pc, transform = Transform.trans(input_pc)

    if opts.estimate_normals:
        with MyTimer("estimate unoriented normals"):
            input_pc = estimate_normals(input_pc, max_nn=opts.n)

    models = [load_model_from_file(m) for m in opts.models]

    with MyTimer("voxel patching"):
        all_patches = divide_pc(input_pc[:, :3], opts.number_parts,
                                min_patch=opts.minimum_points_per_patch)

    with MyTimer("curvature filter"):
        patch_indices = fix_n_filter(input_pc, all_patches, opts.curvature_threshold)

    print(f"number of patches {len(patch_indices)}/{len(all_patches)}")

    with MyTimer("centroid init"):
        for _, p in patch_indices:
            input_pc[p] = orient_center_np(input_pc[p])

    with MyTimer("pick representatives"):
        rng = np.random.default_rng(1)
        represent = []
        for p in all_patches:
            perm = rng.permutation(len(p))
            represent.append((p[perm[:MAX_PATCH_SIZE]], p[perm[MAX_PATCH_SIZE:]]))

    pc_probs = np.ones(len(input_pc), dtype=np.float32)
    key = jax.random.PRNGKey(1)

    with MyTimer("network correction"):
        rep_sets = [represent[i][0] for i, _ in patch_indices] if models else []
        # the reference runs opts.iters sequential re-votes per patch; the
        # patches are independent, so each round is one batched ensemble pass
        for _ in range(opts.iters if rep_sets else 0):
            key, sub = jax.random.split(key)
            votes = ensemble_vote_patches(
                models, [input_pc[r] for r in rep_sets], key=sub
            )
            for reps, (flip, probs) in zip(rep_sets, votes):
                pc_probs[reps] = probs
                input_pc[reps[flip], 3:6] *= -1

    with MyTimer("dipole propagation"):
        input_pc = propagate.strongest_field_propagation_reps(
            input_pc, represent, diffuse=True
        )

    with MyTimer("global sign fix"):
        if fields.measure_mean_potential(input_pc) < 0:
            input_pc[:, 3:6] *= -1

    with MyTimer("export oriented cloud", count=False):
        export_pc(transform.inverse(input_pc), export_path / "final_result.xyz")

    MyTimer.print_total_time()
    return input_pc


def main(argv=None):
    opts = config.get_parser().parse_args(argv)
    opts.export_dir.mkdir(exist_ok=True, parents=True)
    config.export_options(opts)
    run(opts)


if __name__ == "__main__":
    main()
