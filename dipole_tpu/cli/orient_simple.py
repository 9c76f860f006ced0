"""Per-point dipole propagation CLI — the simplest end-to-end path.

Pipeline parity with reference orient_simple.py:8-43:
load -> (optional) estimate normals -> normalize -> strongest-field
propagation -> lattice-potential global sign fix -> denormalize -> export
final_result.xyz. Device-agnostic (runs on CPU or TPU; the fork's forced
.cuda() is not reproduced). Thin wrapper over `dipole_tpu.api.orient_simple`.
"""
from __future__ import annotations

from pathlib import Path

from dipole_tpu import api
from dipole_tpu.utils import config
from dipole_tpu.utils.io import export_pc, load_xyz
from dipole_tpu.utils.timing import timer_factory


def run(opts):
    export_path = Path(opts.export_dir)
    export_path.mkdir(exist_ok=True, parents=True)
    stage_timer = timer_factory()

    with stage_timer("load point cloud", count=False):
        input_pc = load_xyz(opts.pc)

    # reference orient_simple.py:19 pins max_nn=30 (not opts.n)
    oriented = api.orient_simple(input_pc, diffuse=opts.diffuse,
                                 estimate=opts.estimate_normals, n=30,
                                 timer=stage_timer,
                                 mesh=getattr(opts, "mesh", None))

    with stage_timer("export oriented cloud", count=False):
        export_pc(oriented, export_path / "final_result.xyz")

    stage_timer.print_total_time()
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
