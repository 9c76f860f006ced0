"""Run the torch reference's orient_large (the lion/alien pipeline) on CPU —
the north-star end-to-end comparison workload (BASELINE.json: >=20x on lion).

Same shimming as tools/run_reference_network.py. The input cloud is a
synthesized lion stand-in (tools/make_shape.py) because lion.xyz is a
missing blob in the reference repo.

Usage: python tools/run_reference_large.py INPUT.xyz [--out DIR]
"""
import argparse
import sys
import time
from pathlib import Path
from types import SimpleNamespace

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools import torch_shims  # noqa: E402

torch_shims.install()

import torch  # noqa: E402

import util as ref_util  # noqa: E402
from tools.run_reference_network import _upstream_divide_pc  # noqa: E402

ref_util.divide_pc = _upstream_divide_pc

import orient_large as ref_ol  # noqa: E402

PRE = "/root/reference/pre_trained"


def lion_opts(pc: Path, export_dir: Path) -> SimpleNamespace:
    """demos/lion.sh flags."""
    return SimpleNamespace(
        pc=pc,
        export_dir=export_dir,
        models=[Path(PRE) / "hands2.pt", Path(PRE) / "hands.pt",
                Path(PRE) / "manmade.pt"],
        iters=5,
        propagation_iters=4,
        number_parts=41,
        minimum_points_per_patch=100,
        curvature_threshold=0.0,
        diffuse=True,
        weighted_prop=True,
        estimate_normals=False,
        n=50,
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("pc", type=Path)
    ap.add_argument("--out", type=Path, default=Path("/tmp/ref_large_lion"))
    args = ap.parse_args(argv)
    args.out.mkdir(parents=True, exist_ok=True)
    torch.manual_seed(1)
    t0 = time.perf_counter()
    ref_ol.run(lion_opts(args.pc, args.out))
    t = time.perf_counter() - t0
    print(f"\ntorch-CPU reference orient_large on {args.pc}: {t:.1f}s")

    from tools.eval_result import main as eval_main

    eval_main(args.out / "final_result.xyz", args.pc)


if __name__ == "__main__":
    main()
