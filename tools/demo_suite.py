"""Run the full demo suite fresh-process and emit ONE clean table —
GT sign agreement + wall-clock per demo, current defaults, one date
(VERDICT r4 item 6: supersede the interleaved per-round deltas).

Each demo runs exactly as a user would run it: `bash demos/<name>.sh` in
a fresh process (compile cache warm unless --cold). The wall-clock column
is the whole script (for lion/vase/alien that includes stand-in synthesis
and self-scoring — noted in the footer). Accuracy is recomputed here with
dipole_tpu.ops.metrics.sign_agreement, never trusted from the script.

Usage: python tools/demo_suite.py [--demos ok,hand,...] [--json out.json]
"""
import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REF = Path("/root/reference")
OUT = Path("/tmp/dipole_tpu_demos")

# name -> (script, result path, GT path or None, pipeline label)
DEMOS = {
    "ok_simple": ("ok_simple.sh", OUT / "ok_simple/final_result.xyz",
                  REF / "data/ok.xyz", "orient_simple"),
    "fandisk": ("fandisk.sh", OUT / "fandisk/final_result.xyz",
                REF / "data/fandisk.xyz", "orient_pointcloud"),
    "hand": ("hand.sh", OUT / "hand/final_result.xyz",
             REF / "data/hand.xyz", "orient_pointcloud"),
    "ok": ("ok.sh", OUT / "ok/final_result.xyz",
           REF / "data/ok.xyz", "orient_pointcloud"),
    "vase": ("vase.sh", OUT / "vase/final_result.xyz",
             OUT / "vase.xyz", "orient_pointcloud"),
    "lion": ("lion.sh", OUT / "lion/final_result.xyz",
             OUT / "lion.xyz", "orient_large"),
    "alien": ("alien.sh", OUT / "alien/final_result.xyz",
              OUT / "alien.xyz", "orient_large"),
    # no GT normals in the reference data for these three (time-only rows)
    "boxunion": ("boxunion.sh", OUT / "boxunion/final_result.xyz",
                 None, "orient_pointcloud"),
    "flower": ("flower.sh", OUT / "flower/final_result.xyz",
               None, "orient_pointcloud"),
    "galera": ("galera.sh", OUT / "galera/final_result.xyz",
               None, "orient_large"),
}
DEFAULT = "ok_simple,fandisk,hand,ok,vase,lion,alien"


def run_demo(name):
    script, result, gt, pipeline = DEMOS[name]
    if result.exists():
        result.unlink()
    t0 = time.time()
    proc = subprocess.run(["bash", str(REPO / "demos" / script)],
                          capture_output=True, text=True)
    dt = time.time() - t0
    if proc.returncode or not result.exists():
        print(proc.stdout[-2000:], proc.stderr[-2000:], file=sys.stderr)
        return dict(name=name, pipeline=pipeline, error=True, wall_s=dt)
    row = dict(name=name, pipeline=pipeline, wall_s=dt)
    from dipole_tpu.ops import metrics
    from dipole_tpu.utils.io import load_xyz

    res = load_xyz(result)
    row["points"] = len(res)
    if gt is not None and gt.exists():
        gtc = load_xyz(gt)
        row["agreement"] = float(metrics.sign_agreement(res, gtc))
    return row


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--demos", default=DEFAULT)
    ap.add_argument("--json", default="")
    args = ap.parse_args(argv)

    rows = []
    for name in args.demos.split(","):
        print(f"running {name} ...", flush=True)
        row = run_demo(name.strip())
        rows.append(row)
        print(f"  -> {row}", flush=True)

    stamp = time.strftime("%Y-%m-%d")
    print(f"\n### Demo suite ({stamp}, current defaults, fresh CLI process "
          f"per demo, warm compile cache)\n")
    print("| Demo | Pipeline | Points | GT sign agreement | Wall |")
    print("|---|---|---|---|---|")
    for r in rows:
        if r.get("error"):
            print(f"| {r['name']} | {r['pipeline']} | — | FAILED | "
                  f"{r['wall_s']:.0f} s |")
            continue
        agree = f"{r['agreement']:.4f}" if "agreement" in r else "no GT"
        mm, ss = divmod(int(round(r["wall_s"])), 60)
        print(f"| {r['name']} | {r['pipeline']} | {r['points']:,} | {agree} "
              f"| {mm}m {ss:02d}s |")
    print("\n(lion/vase/alien wall-clock includes stand-in synthesis and "
          "self-scoring inside the demo script.)")
    if args.json:
        Path(args.json).write_text(json.dumps(rows, indent=1))


if __name__ == "__main__":
    main()
