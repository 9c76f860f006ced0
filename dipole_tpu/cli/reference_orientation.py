"""Orientation transfer from an oriented reference cloud.

Pipeline parity with reference reference_orientation.py:8-41: one dense
dipole field evaluation of the reference cloud at the input points; inputs
without normals adopt the normalized field direction, inputs with normals
only take the field's sign. No normalization and no global sign fix."""
from __future__ import annotations

import argparse
from pathlib import Path

from dipole_tpu.ops.estimate import estimate_normals
from dipole_tpu.ops.fields import reference_field
from dipole_tpu.utils.io import export_pc, load_xyz
from dipole_tpu.utils.timing import timer_factory


def run(opts):
    stage_timer = timer_factory()
    with stage_timer("load input cloud", count=False):
        input_pc = load_xyz(opts.input, append_normals=False)
    with stage_timer("load reference cloud", count=False):
        ref_pc = load_xyz(opts.reference)

    if input_pc.shape[-1] == 3 and opts.estimate_normals:
        with stage_timer("estimate unoriented normals"):
            input_pc = estimate_normals(input_pc, max_nn=opts.n)

    with stage_timer("evaluate reference field"):
        input_pc = reference_field(ref_pc, input_pc)

    with stage_timer("export transferred normals", count=False):
        export_pc(input_pc, opts.output)

    stage_timer.print_total_time()
    return input_pc


def get_parser():
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", type=Path, required=True)
    parser.add_argument("--reference", type=Path, required=True)
    parser.add_argument("--output", type=Path, required=True)
    parser.add_argument("--n", type=int, default=30,
                        help="neighborhood size for PCA normal estimation")
    parser.add_argument("--estimate_normals", action="store_true",
                        help="compute unoriented PCA normals on the input "
                             "first; without this flag the reference field "
                             "supplies both the direction and the sign")
    return parser


def main(argv=None):
    from dipole_tpu.utils.warmup import ensure_warm

    opts = get_parser().parse_args(argv)
    ensure_warm()  # warm-by-default first run (no-op once per machine)
    run(opts)


if __name__ == "__main__":
    main()
