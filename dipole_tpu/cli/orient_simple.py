"""Per-point dipole propagation CLI — the simplest end-to-end path.

Pipeline parity with reference orient_simple.py:8-43:
load -> (optional) estimate normals -> normalize -> strongest-field
propagation -> lattice-potential global sign fix -> denormalize -> export
final_result.xyz. Device-agnostic (runs on CPU or TPU; the fork's forced
.cuda() is not reproduced).
"""
from __future__ import annotations

from pathlib import Path

import numpy as np

from dipole_tpu.ops import fields, propagate
from dipole_tpu.ops.estimate import estimate_normals
from dipole_tpu.utils import config
from dipole_tpu.utils.io import Transform, export_pc, load_xyz
from dipole_tpu.utils.timing import timer_factory


def run(opts):
    export_path = Path(opts.export_dir)
    export_path.mkdir(exist_ok=True, parents=True)
    MyTimer = timer_factory()

    with MyTimer("load point cloud", count=False):
        input_pc = load_xyz(opts.pc)

    if opts.estimate_normals:
        with MyTimer("estimate unoriented normals"):
            input_pc = estimate_normals(input_pc, max_nn=30)

    input_pc, transform = Transform.trans(input_pc)

    with MyTimer("dipole propagation"):
        input_pc = propagate.strongest_field_propagation_points(
            input_pc, diffuse=opts.diffuse, starting_point=0
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
