"""Patch-based orientation with PointCNN ensemble correction.

Pipeline parity with reference orient_pointcloud.py:11-83: voxel patches ->
curvature filter -> orient_center init -> iterate {ensemble flip votes,
periodic strongest-field patch propagation} -> final propagation -> lattice
sign fix -> export. divide_pc restores upstream divide->merge semantics (the
fork's regression at util.py:338-341 is not reproduced; SURVEY §7)."""
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


def run(opts):
    import jax

    MyTimer = timer_factory()
    export_path = Path(opts.export_dir)
    export_path.mkdir(exist_ok=True, parents=True)

    pc = load_xyz(opts.pc)
    if opts.estimate_normals:
        with MyTimer("estimate unoriented normals"):
            pc = estimate_normals(pc, max_nn=opts.n)
    input_pc, transform = Transform.trans(pc)

    models = [load_model_from_file(m) for m in opts.models]

    with MyTimer("voxel patching"):
        all_patches = divide_pc(input_pc[:, :3], opts.number_parts,
                                min_patch=opts.minimum_points_per_patch)

    with MyTimer("curvature filter"):
        patch_indices = fix_n_filter(input_pc, all_patches, opts.curvature_threshold)

    print(f"number of patches {len(patch_indices)}")

    with MyTimer("centroid init"):
        for _, p in patch_indices:
            input_pc[p] = orient_center_np(input_pc[p])

    pc_probs = np.ones(len(input_pc), dtype=np.float32)
    key = jax.random.PRNGKey(1)

    def propagate_now():
        return propagate.strongest_field_propagation_patches(
            input_pc, patch_indices, all_patches, diffuse=opts.diffuse,
            weights=pc_probs if opts.weighted_prop else None,
        )

    for it in range(opts.iters):
        with MyTimer(f"iteration {it}"):
            if models and patch_indices:
                # one batched ensemble pass over all filtered patches (each
                # forward reads only its own patch, so this is exactly the
                # reference's sequential per-patch loop)
                key, sub = jax.random.split(key)
                votes = ensemble_vote_patches(
                    models, [input_pc[pidx] for _, pidx in patch_indices], key=sub
                )
                for (_, pidx), (flip, probs) in zip(patch_indices, votes):
                    probs = probs.copy()
                    probs[flip] = 1 - probs[flip]
                    pc_probs[pidx] = probs
                    input_pc[pidx[flip], 3:6] *= -1

            if it % opts.propagation_iters == 0 and (it != 0 or opts.propagation_iters == 1):
                with MyTimer("patch propagation"):
                    input_pc = propagate_now()

    with MyTimer("patch propagation"):
        input_pc = propagate_now()

    with MyTimer("global sign fix"):
        if fields.measure_mean_potential(input_pc) < 0:
            input_pc[:, 3:6] *= -1

    MyTimer.print_total_time()
    export_pc(transform.inverse(input_pc), export_path / "final_result.xyz")
    return input_pc


def main(argv=None):
    opts = config.get_parser().parse_args(argv)
    opts.export_dir.mkdir(exist_ok=True, parents=True)
    config.export_options(opts)
    run(opts)


if __name__ == "__main__":
    main()
