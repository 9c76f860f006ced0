"""End-to-end warm benchmarks: run each pipeline twice in one process and
report the second (warm) run — the axon backend defers compilation to first
execution, so cold numbers measure the compile queue, not the framework.

Usage: python tools/e2e_bench.py [--quick]
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dipole_tpu.ops import fields, propagate  # noqa: E402
from dipole_tpu.ops.estimate import estimate_normals  # noqa: E402
from dipole_tpu.ops.patching import divide_pc, fix_n_filter  # noqa: E402
from dipole_tpu.utils.io import Transform, load_xyz, orient_center_np  # noqa: E402


def time2(fn):
    fn()
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main(quick=False):
    results = {}
    ok = load_xyz("/root/reference/data/ok.xyz")
    ok_n, _ = Transform.trans(ok)

    # orient_simple core (10k)
    def simple():
        out = propagate.strongest_field_propagation_points(ok_n, diffuse=True)
        if fields.measure_mean_potential(out) < 0:
            out[:, 3:6] *= -1
        return out
    dt, _ = time2(simple)
    results["orient_simple_core_10k_warm_s"] = round(dt, 3)

    # normal estimation (10k)
    dt, _ = time2(lambda: estimate_normals(ok[:, :3], max_nn=50))
    results["estimate_normals_10k_warm_s"] = round(dt, 3)

    # patch propagation (golden config patches)
    patches = divide_pc(ok_n[:, :3], 41, min_patch=100)
    prepared = ok_n.copy()
    filtered = fix_n_filter(prepared, patches, 0.0)
    for _, p in filtered:
        prepared[p] = orient_center_np(prepared[p])
    dt, _ = time2(lambda: propagate.strongest_field_propagation_patches(
        prepared, filtered, patches, diffuse=True))
    results["patch_propagation_64p_10k_warm_s"] = round(dt, 3)

    if not quick:
        big = load_xyz("/root/reference/data/boxunion.xyz", append_normals=False)
        big_n, _ = Transform.trans(big)
        dt, est = time2(lambda: estimate_normals(big_n, max_nn=50))
        results["estimate_normals_100k_warm_s"] = round(dt, 3)

        def large_prop():
            return propagate.strongest_field_propagation_points(est, diffuse=True)
        dt, _ = time2(large_prop)
        results["point_propagation_100k_warm_s"] = round(dt, 3)

        dt, _ = time2(lambda: np.asarray(fields.field_grad(est, est[:, :3])))
        results["field_eval_100k_sq_warm_s"] = round(dt, 3)
        results["field_eval_100k_sq_Gpairs_per_s"] = round(1e10 / dt / 1e9, 2)

    print(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
