"""Point-cloud format conversion (the reference run.ipynb workflow: batch
ply -> xyz for the pipelines, and xyz -> ply for viewers).

Usage:
  python tools/convert.py in.ply out.xyz
  python tools/convert.py in.xyz out.ply
  python tools/convert.py --folder dir_with_plys out_dir   (batch ply -> xyz)
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dipole_tpu.utils.io import export_pc, load_point_cloud, write_ply  # noqa: E402


def convert(src, dst):
    pc = load_point_cloud(src)
    dst = Path(dst)
    if dst.suffix.lower() == ".ply":
        write_ply(dst, pc[:, :3], pc[:, 3:6] if pc.shape[1] >= 6 else None)
    else:
        export_pc(pc, dst)
    print(f"{src} -> {dst} ({len(pc)} points)")


def main(argv):
    if argv[0] == "--folder":
        src_dir, out_dir = Path(argv[1]), Path(argv[2])
        out_dir.mkdir(parents=True, exist_ok=True)
        for p in sorted(src_dir.glob("*.ply")):
            convert(p, out_dir / (p.stem + ".xyz"))
    else:
        convert(argv[0], argv[1])


if __name__ == "__main__":
    main(sys.argv[1:])
