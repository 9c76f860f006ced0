"""Programmatic API facade (reference dipole_api.py:14-136).

Exposes orient_large as a callable with api-flavored defaults
(estimate_normals on by default, ensemble checkpoints preloaded). The
reference module is a duplicate of orient_large with developer-machine
default paths; here it delegates to the canonical pipeline."""
from __future__ import annotations

import argparse
from pathlib import Path

from dipole_tpu.cli import orient_large as _orient_large

DEFAULT_MODELS = [
    Path("/root/reference/pre_trained/hands2.pt"),
    Path("/root/reference/pre_trained/hands.pt"),
    Path("/root/reference/pre_trained/manmade.pt"),
]


def orient_large(opts):
    """Run the representative-point pipeline (reference dipole_api.py:14-87)."""
    return _orient_large.run(opts)


def orient_large_np(points, models=None, **kwargs):
    """Orient an (N, 3|6) array in memory; returns the oriented (N, 6) array.

    Convenience wrapper not present in the reference CLI but implied by its
    'programmatic API' role; delegates to `dipole_tpu.api.orient_large`."""
    from dipole_tpu import api

    return api.orient_large(
        points, models=models or DEFAULT_MODELS,
        iters=kwargs.pop("iters", 5),
        number_parts=kwargs.pop("number_parts", 10),
        minimum_points_per_patch=kwargs.pop("minimum_points_per_patch", 100),
        curvature_threshold=kwargs.pop("curvature_threshold", 0.0),
        estimate=kwargs.pop("estimate_normals", True),
        n=kwargs.pop("n", 30),
    )


def get_parser():
    """API-flavored parser (reference dipole_api.py:101-132): same flags as
    the base parser but with api defaults and nothing required."""
    parser = argparse.ArgumentParser()
    parser.add_argument("--pc", type=Path, default=None, help="path to the point cloud")
    parser.add_argument("--models", type=Path, nargs="+", default=DEFAULT_MODELS)
    parser.add_argument("--export_dir", type=Path, default=Path("output"))
    parser.add_argument("--number_parts", type=int, default=10)
    parser.add_argument("--minimum_points_per_patch", type=int, default=100)
    parser.add_argument("--curvature_threshold", type=float, default=0.0)
    parser.add_argument("--iters", type=int, default=5)
    parser.add_argument("--diffuse", default=True, action="store_true")
    parser.add_argument("--weighted_prop", default=True, action="store_true")
    parser.add_argument("--estimate_normals", default=True, action="store_true")
    parser.add_argument("--n", type=int, default=30)
    return parser


def main(argv=None):
    from dipole_tpu.utils.warmup import ensure_warm

    opts = get_parser().parse_args(argv)
    Path(opts.export_dir).mkdir(parents=True, exist_ok=True)
    ensure_warm()  # warm-by-default first run (no-op once per machine)
    orient_large(opts)


if __name__ == "__main__":
    main()
