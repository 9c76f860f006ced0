"""Print sign agreement and angular metrics of an oriented result against a
ground-truth cloud, using the framework's canonical metrics
(dipole_tpu.ops.metrics — the BASELINE.json acceptance metric).

Usage: python tools/eval_result.py final_result.xyz gt.xyz
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main(result_path, gt_path):
    from dipole_tpu.ops import metrics
    from dipole_tpu.utils.io import load_xyz

    res = load_xyz(result_path)
    gt = load_xyz(gt_path)
    assert len(res) == len(gt), (len(res), len(gt))
    agree = metrics.sign_agreement(res, gt)
    m = metrics.cal_metrics(res, gt)
    print(f"sign agreement vs GT: {agree:.6f}  (n={len(res)})")
    print(f"mean angular error: {m['loss']:.2f} deg; "
          f"<90deg agreements: {m['count_90']}/{m['total_count']}")
    return agree


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
