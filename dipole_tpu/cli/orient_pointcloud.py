"""Patch-based orientation with PointCNN ensemble correction.

Pipeline parity with reference orient_pointcloud.py:11-83: voxel patches ->
curvature filter -> orient_center init -> iterate {ensemble flip votes,
periodic strongest-field patch propagation} -> final propagation -> lattice
sign fix -> export. divide_pc restores upstream divide->merge semantics (the
fork's regression at util.py:338-341 is not reproduced; SURVEY §7). Thin
wrapper over `dipole_tpu.api.orient_patches`."""
from __future__ import annotations

from pathlib import Path

from dipole_tpu import api
from dipole_tpu.utils import config
from dipole_tpu.utils.io import export_pc, load_xyz
from dipole_tpu.utils.timing import timer_factory


def run(opts):
    stage_timer = timer_factory()
    export_path = Path(opts.export_dir)
    export_path.mkdir(exist_ok=True, parents=True)

    pc = load_xyz(opts.pc)
    consensus = int(getattr(opts, "consensus", 1))
    seed0 = int(getattr(opts, "vote_seed", 1))
    if consensus <= 1:
        entry = lambda pc, **kw: api.orient_patches(  # noqa: E731
            pc, vote_seed=seed0, **kw)
    else:
        entry = lambda pc, **kw: api.orient_patches_consensus(  # noqa: E731
            pc, vote_seeds=list(range(seed0, seed0 + consensus)), **kw)
    oriented = entry(
        pc, models=opts.models, iters=opts.iters,
        propagation_iters=opts.propagation_iters,
        number_parts=opts.number_parts,
        minimum_points_per_patch=opts.minimum_points_per_patch,
        curvature_threshold=opts.curvature_threshold,
        diffuse=opts.diffuse, weighted_prop=opts.weighted_prop,
        estimate=opts.estimate_normals, n=opts.n, timer=stage_timer,
        mesh=getattr(opts, "mesh", None),
        torch_rng=getattr(opts, "torch_rng", None),
        vote_starts=getattr(opts, "vote_starts", 1),
        fps_starts=getattr(opts, "fps_starts", "rng"),
        vote_margin=getattr(opts, "vote_margin", 0.0),
        fix_models=getattr(opts, "fix_models", ()),
        fix_margin=getattr(opts, "fix_margin", 0.25),
        fix_when=getattr(opts, "fix_when", "last"),
        fix_vote=getattr(opts, "fix_vote", "all"),
    )

    stage_timer.print_total_time()
    export_pc(oriented, export_path / "final_result.xyz")
    return oriented


def main(argv=None):
    opts = config.get_parser().parse_args(argv)
    opts.export_dir.mkdir(exist_ok=True, parents=True)
    config.export_options(opts)
    from dipole_tpu.utils.warmup import ensure_warm

    ensure_warm()  # warm-by-default first run (no-op once per machine)
    run(opts)


if __name__ == "__main__":
    main()
