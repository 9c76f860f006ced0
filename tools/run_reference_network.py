"""Run the torch reference's full network pipeline (orient_pointcloud) on the
golden ok config and compare everything pairwise.

The committed golden file (/root/reference/demos/ok/final_result.xyz) was
produced on the author's CUDA machine years ago; FPS random starts, LAPACK
eigenvector signs and torch RNG all differ across builds, so bit-reproducing
it is not possible from any rebuild. This harness quantifies that: it runs
the ACTUAL reference code (CPU torch, C++ deps shimmed via tools/torch_shims,
fork's divide_pc regression restored to upstream semantics) on the exact
golden config and prints sign agreements of
    fresh-reference vs golden, ours vs fresh-reference, ours vs golden,
    and each vs ground truth —
the attribution evidence for BASELINE.md.

--demo hand / --demo fandisk run those demos' configs (demos/{hand,fandisk}.sh)
instead: both pipelines get the SAME pre-estimated unoriented normals (ours,
hybrid radius+max_nn — the reference's Open3D is not installable here), so the
comparison isolates the orientation pipeline from normal-estimation variance.

Usage: python tools/run_reference_network.py [--demo ok|hand|fandisk]
                                             [--skip-ours] [--seed N]
"""
import argparse
import sys
import time
from pathlib import Path
from types import SimpleNamespace

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools import torch_shims  # noqa: E402

torch_shims.install()

import torch  # noqa: E402

import util as ref_util  # noqa: E402


def _upstream_divide_pc(pc_in, n_part, ranges=(-1.5, 1.5), min_patch=0):
    """Upstream (galmetzer) divide_pc semantics: voxel divide, merge small
    patches, return flat index tensors. The fork dropped the merge_nodes
    call (util.py:338-341) which crashes orient_pointcloud.py:27; the golden
    file predates that regression (SURVEY §7 'bugs not to replicate')."""
    indices, ijk = ref_util._divide_pc(pc_in, n_part, ranges, min_patch)
    indices, ijk = ref_util.merge_nodes(pc_in, indices, ijk, min_patch)
    return indices


ref_util.divide_pc = _upstream_divide_pc

import orient_pointcloud as ref_op  # noqa: E402


GOLDEN = "/root/reference/demos/ok/final_result.xyz"
DATA = "/root/reference/data/ok.xyz"
PRE = "/root/reference/pre_trained"

# (iters, propagation_iters, number_parts, min_patch, curvature) per demo —
# the flag sets of /root/reference/demos/{ok/opts.txt, hand.sh, fandisk.sh}
DEMO_CFG = {
    "ok": ("ok.xyz", 5, 4, 41, 100, 0.0),
    "hand": ("hand.xyz", 10, 5, 30, 100, 0.01),
    "fandisk": ("fandisk.xyz", 3, 5, 30, 100, 0.0),
}


def golden_opts(export_dir: Path, demo: str = "ok",
                pc_path: str | None = None) -> SimpleNamespace:
    """The exact config of the demo (ok = demos/ok/opts.txt, the golden run)."""
    fname, iters, prop_iters, parts, min_patch, curv = DEMO_CFG[demo]
    return SimpleNamespace(
        pc=Path(pc_path or f"/root/reference/data/{fname}"),
        export_dir=export_dir,
        models=[Path(PRE) / "hands2.pt", Path(PRE) / "hands.pt",
                Path(PRE) / "manmade.pt"],
        iters=iters,
        propagation_iters=prop_iters,
        number_parts=parts,
        minimum_points_per_patch=min_patch,
        curvature_threshold=curv,
        diffuse=True,
        weighted_prop=True,
        estimate_normals=False,
        n=50,
    )


def pre_estimated_input(demo: str, out_dir: Path) -> Path:
    """Write the demo cloud with OUR estimated (unoriented) normals so both
    pipelines consume identical inputs."""
    from dipole_tpu.ops.estimate import estimate_normals
    from dipole_tpu.utils.io import export_pc, load_xyz

    fname = DEMO_CFG[demo][0]
    pc = load_xyz(f"/root/reference/data/{fname}", append_normals=False)
    est = estimate_normals(pc[:, :3], max_nn=30)
    path = out_dir / f"{demo}_estimated.xyz"
    export_pc(np.asarray(est), path)
    return path


def load6(path) -> np.ndarray:
    rows = []
    for line in open(path):
        t = line.split()
        if len(t) >= 6:
            rows.append([float(v) for v in t[:6]])
    return np.asarray(rows, np.float64)


def agreement(a: np.ndarray, b: np.ndarray) -> float:
    from dipole_tpu.ops.metrics import sign_agreement

    return sign_agreement(a, b)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--demo", choices=sorted(DEMO_CFG), default="ok")
    ap.add_argument("--skip-ours", action="store_true")
    ap.add_argument("--seed", type=int, default=1,
                    help="torch.manual_seed (reference pins 1 at import)")
    ap.add_argument("--torch_rng", action="store_true",
                    help="run ours with --torch_rng <seed>: replay the "
                         "reference's FPS-start stream bit-exactly")
    ap.add_argument("--out", type=Path, default=None)
    args = ap.parse_args(argv)

    out = args.out or Path(f"/tmp/ref_network_{args.demo}")
    out.mkdir(parents=True, exist_ok=True)
    data = f"/root/reference/data/{DEMO_CFG[args.demo][0]}"
    if args.demo == "ok":
        pc_path = data  # golden config consumes the file's GT normals as-is
    else:
        pc_path = str(pre_estimated_input(args.demo, out))
        print(f"shared pre-estimated input: {pc_path}")

    torch.manual_seed(args.seed)
    t0 = time.perf_counter()
    ref_op.run(golden_opts(out, args.demo, pc_path))
    t_ref = time.perf_counter() - t0
    fresh = load6(out / "final_result.xyz")
    print(f"\nfresh reference run: {t_ref:.1f}s")

    gt = load6(data)
    print(f"fresh-ref vs GT     : {agreement(fresh, gt):.6f}")
    if args.demo == "ok":
        golden = load6(GOLDEN)
        print(f"fresh-ref vs golden : {agreement(fresh, golden):.6f}")
        print(f"golden    vs GT     : {agreement(golden, gt):.6f}")

    if not args.skip_ours:
        from dipole_tpu.cli import orient_pointcloud as ours_op

        _, iters, prop_iters, parts, min_patch, curv = DEMO_CFG[args.demo]
        ours_dir = out / "ours"
        ours_dir.mkdir(exist_ok=True)
        t0 = time.perf_counter()
        argv_ours = [
            "--pc", pc_path, "--export_dir", str(ours_dir),
            "--models", f"{PRE}/hands2.pt", f"{PRE}/hands.pt",
            f"{PRE}/manmade.pt",
            "--iters", str(iters), "--propagation_iters", str(prop_iters),
            "--number_parts", str(parts),
            "--minimum_points_per_patch", str(min_patch),
            "--curvature_threshold", str(curv), "--diffuse", "--weighted_prop",
        ]
        if args.torch_rng:
            argv_ours += ["--torch_rng", str(args.seed)]
        ours_op.main(argv_ours)
        t_ours = time.perf_counter() - t0
        ours = load6(ours_dir / "final_result.xyz")
        print(f"\nours run: {t_ours:.1f}s  (speedup vs fresh ref: {t_ref/t_ours:.1f}x)")
        print(f"ours vs fresh-ref   : {agreement(ours, fresh):.6f}")
        print(f"ours vs GT          : {agreement(ours, gt):.6f}")
        if args.demo == "ok":
            print(f"ours vs golden      : {agreement(ours, load6(GOLDEN)):.6f}")


if __name__ == "__main__":
    main()
