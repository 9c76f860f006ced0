"""Measure (not assert) the dispatch-constant crossovers (VERDICT r1 item 7).

Two boundaries govern kernel dispatch:
  * ops/propagate.MATRIX_LIMIT (greedy: precomputed NxN interaction matrix
    vs single-kernel Pallas on-the-fly columns)
  * ops/fields_pallas.MAX_PALLAS_SOURCES (field eval: VMEM-resident Pallas
    source panel vs XLA-blocked streaming)

This sweeps N across each boundary on the real TPU, times both paths warm,
and prints a table + the measured crossover. Run:
    python tools/crossover_bench.py [--quick]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _cloud(n, seed=0):
    r = np.random.default_rng(seed)
    pc = r.normal(size=(n, 6)).astype(np.float32)
    pc[:, 3:] /= np.linalg.norm(pc[:, 3:], axis=1, keepdims=True)
    return pc


def _time(fn, iters=3):
    fn()  # warm (compile)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    np.asarray(out)  # axon: sync via host transfer
    return (time.perf_counter() - t0) / iters


def greedy_crossover(sizes, iters=3):
    from dipole_tpu.ops import propagate

    print("\n== greedy_sign_sequence: matrix vs on-the-fly (MATRIX_LIMIT) ==")
    print(f"{'N':>8} {'matrix[s]':>10} {'on-the-fly[s]':>14} {'winner':>12}")
    cross = None
    prev_winner = None
    for n in sizes:
        pc = _cloud(n)
        try:
            t_mat = _time(lambda: propagate.greedy_sign_sequence(
                pc, matrix_limit=10**9)[1], iters)
        except Exception as e:  # HBM OOM: the matrix simply does not fit
            print(f"{n:>8} {'OOM':>10} ({type(e).__name__})")
            t_mat = float("inf")
        t_fly = _time(lambda: propagate.greedy_sign_sequence(
            pc, matrix_limit=0)[1], iters)
        winner = "matrix" if t_mat < t_fly else "on-the-fly"
        if prev_winner == "matrix" and winner == "on-the-fly":
            cross = n
        prev_winner = winner
        print(f"{n:>8} {t_mat:>10.3f} {t_fly:>14.3f} {winner:>12}")
    print(f"measured crossover: {cross} (current MATRIX_LIMIT="
          f"{propagate.MATRIX_LIMIT})")
    return cross


def field_crossover(sizes, iters=3):
    import os

    from dipole_tpu.ops import fields, fields_pallas

    print("\n== field_grad: Pallas VMEM panel vs XLA-blocked "
          "(MAX_PALLAS_SOURCES) ==")
    print(f"{'N src':>8} {'pallas[s]':>10} {'xla[s]':>10} "
          f"{'pallas GP/s':>12} {'xla GP/s':>10}")
    tgt = _cloud(65536)[:, :3]   # big enough that pair work dwarfs dispatch
    for n in sizes:
        pc = _cloud(n)
        try:
            t_pal = _time(lambda: fields_pallas.field_grad_pallas(pc, tgt), iters)
        except Exception as e:  # VMEM overflow etc.
            print(f"{n:>8} {'FAIL':>10} ({type(e).__name__})")
            continue
        os.environ["DIPOLE_TPU_NO_PALLAS"] = "1"
        try:
            t_xla = _time(lambda: fields.field_grad(pc, tgt), iters)
        finally:
            del os.environ["DIPOLE_TPU_NO_PALLAS"]
        gp = n * len(tgt) / 1e9
        print(f"{n:>8} {t_pal:>10.4f} {t_xla:>10.4f} "
              f"{gp / t_pal:>12.1f} {gp / t_xla:>10.1f}")
    print(f"(current MAX_PALLAS_SOURCES={fields_pallas.MAX_PALLAS_SOURCES})")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args(argv)
    if args.quick:
        gsizes = [8000, 16000, 24000]
        fsizes = [65536, 262144]
    else:
        # 32000 pads to a 32768^2 matrix (4.3 GB); the next bucket would
        # not fit HBM, which is itself part of why a matrix limit exists
        gsizes = [4000, 8000, 12000, 16000, 20000, 24000, 32000]
        fsizes = [65536, 131072, 262144, 327680, 393216, 524288]
    greedy_crossover(gsizes)
    field_crossover(fsizes)


if __name__ == "__main__":
    main()
