"""Decide the large-N per-point greedy story with numbers (VERDICT r2 item 4).

Compares every single-chip dispatch path of the strongest-field greedy
ordering (ops/propagate.greedy_sign_sequence) at 100k / 300k / 1M points on
the real TPU, warm:

  * matrix     — precomputed NxN interaction + VMEM scan (<= MATRIX_LIMIT)
  * resident   — single-kernel Pallas, whole cloud in VMEM
                 (<= propagate_pallas.MAX_PALLAS_GREEDY)
  * streamed   — HBM-streamed Pallas: cloud panels DMA'd per step, only
                 accumulator + sign state resident
                 (<= propagate_pallas.MAX_PALLAS_STREAMED)
  * xl         — fully HBM-resident Pallas (acc/sign state in HBM too,
                 <= propagate_pallas.MAX_PALLAS_XL = 2^24); the only
                 single-chip path past ~1M points
  * scan       — XLA on-the-fly lax.scan fallback (any N; O(N) compiled
                 steps, each a full-cloud column eval)

--check-overlap N additionally runs streamed AND xl on the same cloud at
an N both can handle and asserts bit-identical greedy sign decisions —
the hardware proof (VERDICT r4 item 2) that the XL tier implements the
same algorithm, not just an interpret-mode cousin.

and prints the per-N winner plus an analytic latency model for the
multi-chip distributed greedy (parallel.sharding.greedy_sign_sequence_
sharded): that loop issues ~4 collectives per sequential step, so its wall
clock is >= N * 4 * t_ici regardless of D — the model says at which N (if
any) it can beat the streamed single-chip kernel.

The measured table goes into BASELINE.md ("large-N greedy decision table");
the dispatch constants in ops/propagate.py / ops/propagate_pallas.py are
set from it.

Usage: python tools/greedy_large_bench.py [--sizes 100000,300000,1000000]
       [--scan-cap 150000]   # largest N to time the XLA scan at (it is
                             # minutes-slow beyond; extrapolated O(N^2) above)
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# v5e ICI per-hop latency class (scaling-book numbers are ~1 us/hop; keep a
# conservative band) — used only for the analytic distributed model.
ICI_LAT_LO_S = 1.0e-6
ICI_LAT_HI_S = 5.0e-6
COLLECTIVES_PER_STEP = 4  # argmax psum, winner bcast, column psum, state sync


def _cloud(n, seed=0):
    r = np.random.default_rng(seed)
    pc = r.normal(size=(n, 6)).astype(np.float32)
    pc[:, 3:] /= np.linalg.norm(pc[:, 3:], axis=1, keepdims=True)
    return pc


def _time(fn, iters=2):
    out = fn()
    np.asarray(out)  # axon: sync via host transfer (block_until_ready lies)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
        np.asarray(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="100000,300000,1000000")
    ap.add_argument("--scan-cap", type=int, default=150000)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--check-overlap", type=int, default=0,
                    help="N at which streamed and xl must produce identical "
                         "sign decisions (0 = skip)")
    ap.add_argument("--xl", action="store_true",
                    help="time the XL tier at every size it can handle "
                         "(not just past the streamed ceiling)")
    args = ap.parse_args(argv)
    sizes = [int(s) for s in args.sizes.split(",")]

    from dipole_tpu.ops import propagate, propagate_pallas

    if args.check_overlap:
        n = args.check_overlap
        pc = _cloud(n)
        t0 = time.perf_counter()
        _, s_str = propagate_pallas.greedy_sign_sequence_pallas_streamed(pc, 0)
        s_str = np.asarray(s_str)
        t_str = time.perf_counter() - t0
        t0 = time.perf_counter()
        _, s_xl = propagate_pallas.greedy_sign_sequence_pallas_xl(pc, 0)
        s_xl = np.asarray(s_xl)
        t_xl = time.perf_counter() - t0
        same = int((s_str == s_xl).sum())
        print(f"overlap check N={n}: streamed {t_str:.1f}s (cold) vs xl "
              f"{t_xl:.1f}s (cold); identical decisions {same}/{n} "
              f"({'PASS' if same == n else 'FAIL'})", flush=True)
        if same != n:
            raise SystemExit(1)

    print(f"{'N':>9} {'matrix[s]':>10} {'resident[s]':>12} {'streamed[s]':>12} "
          f"{'xl[s]':>10} {'scan[s]':>10} {'winner':>9}")
    rows = []
    for n in sizes:
        pc = _cloud(n)
        res = {}
        if n <= propagate.MATRIX_LIMIT:
            res["matrix"] = _time(lambda: propagate.greedy_sign_sequence(
                pc, matrix_limit=10**9)[1], args.iters)
        if n <= propagate_pallas.MAX_PALLAS_GREEDY:
            res["resident"] = _time(
                lambda: propagate_pallas.greedy_sign_sequence_pallas(pc, 0)[1],
                args.iters)
        if n <= propagate_pallas.MAX_PALLAS_STREAMED:
            res["streamed"] = _time(
                lambda: propagate_pallas.greedy_sign_sequence_pallas_streamed(
                    pc, 0)[1], args.iters)
        if n <= propagate_pallas.MAX_PALLAS_XL and (
                args.xl or n > propagate_pallas.MAX_PALLAS_STREAMED):
            res["xl"] = _time(
                lambda: propagate_pallas.greedy_sign_sequence_pallas_xl(
                    pc, 0)[1], args.iters)
        if n <= args.scan_cap:
            res["scan"] = _time(lambda: propagate.greedy_sign_sequence(
                pc, matrix_limit=0)[1], args.iters)
        winner = min(res, key=res.get)
        rows.append((n, res, winner))

        def cell(k):
            return f"{res[k]:.2f}" if k in res else "—"

        print(f"{n:>9} {cell('matrix'):>10} {cell('resident'):>12} "
              f"{cell('streamed'):>12} {cell('xl'):>10} {cell('scan'):>10} "
              f"{winner:>9}", flush=True)

    print("\n== analytic distributed-greedy latency floor "
          "(sharding.greedy_sign_sequence_sharded) ==")
    print(f"{'N':>9} {'floor_lo[s]':>12} {'floor_hi[s]':>12} "
          f"{'best_1chip[s]':>14} {'distributed can win?':>22}")
    for n, res, winner in rows:
        lo = n * COLLECTIVES_PER_STEP * ICI_LAT_LO_S
        hi = n * COLLECTIVES_PER_STEP * ICI_LAT_HI_S
        best = res[winner]
        verdict = "no (latency floor alone loses)" if lo > best else \
            "only if compute-bound" if hi > best else "possibly"
        print(f"{n:>9} {lo:>12.2f} {hi:>12.2f} {best:>14.2f} {verdict:>22}")
    print("\nThe distributed loop pays >= 4 sequential collectives per point;"
          "\nits use case is HBM capacity (cloud > 1 chip), not speed.")


if __name__ == "__main__":
    main()
