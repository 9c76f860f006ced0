"""Print sign agreement (and angular metrics when directions differ) of an
oriented result against a ground-truth cloud.

Usage: python tools/eval_result.py final_result.xyz gt.xyz
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(result_path, gt_path):
    from dipole_tpu.utils.io import load_xyz

    res = load_xyz(result_path)
    gt = load_xyz(gt_path)
    assert len(res) == len(gt), (len(res), len(gt))
    s = (res[:, 3:6] * gt[:, 3:6]).sum(1) > 0
    agree = max(s.mean(), 1 - s.mean())
    print(f"sign agreement vs GT: {agree:.6f}  (n={len(res)})")
    return agree


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
