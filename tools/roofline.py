"""Empirical VPU roofline for the dipole pair kernels (VERDICT r1 item 6).

The field kernel is elementwise (VPU) math, not MXU matmul: per source-target
pair it does ~30 mul/add lane-ops, 1 sqrt and 1 divide (after the round-2
single-reciprocal refactor; it was 1 sqrt + 2 divides). Rather than quote
datasheet numbers, this measures the chip's own ceilings with
arithmetic-intense fused chains (K dependent ops per element on a small
array, so HBM traffic is negligible):

  * fma chain     -> mul/add lane-ops per second
  * divide chain  -> divides per second
  * sqrt chain    -> sqrts per second

and derives the pair-rate bound  1 / (n_fma/R_fma + n_div/R_div +
n_sqrt/R_sqrt)  (serial-unit assumption, conservative) and
max-unit bound (parallel-issue assumption, optimistic), then compares the
achieved bench.py rate against both. Run on the TPU:
    python tools/roofline.py
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

K = 8192         # chained ops per element (big enough that one call's
                 # compute dwarfs the remote-dispatch latency)
N = 1 << 21      # elements (8 MiB f32; smaller arrays lose lane occupancy,
                 # larger ones turn the loop-carried streams HBM-bound)


def _rate(fn, x, ops_per_elem, iters=5):
    np.asarray(fn(x))                 # compile + sync (scalar output: the
    t0 = time.perf_counter()          # tunnel moves 4 bytes, not the array)
    for _ in range(iters):
        y = fn(x)
    np.asarray(y)
    dt = (time.perf_counter() - t0) / iters
    return x.size * ops_per_elem / dt


_STREAMS = 8   # independent dependency chains so the unit pipelines fill
               # (a single chain measures op latency, not throughput)


def _chained(step):
    @jax.jit
    def run(x):
        xs = tuple(x * (1.0 + 0.001 * i) for i in range(_STREAMS))

        def body(_, xs):
            return tuple(step(xi) for xi in xs)

        xs = jax.lax.fori_loop(0, K // _STREAMS, body, xs)
        out = xs[0]
        for xi in xs[1:]:
            out = out + xi
        return jnp.sum(out)

    return run


fma_chain = _chained(lambda x: x * 1.0000001 + 1e-9)
div_chain = _chained(lambda x: 1.02 / (x + 1.0))
sqrt_chain = _chained(lambda x: jnp.sqrt(x + 1.0001))


# per-pair op counts of the Pallas field kernel (_pair_terms after the
# single-reciprocal refactor); mul/add counted as lane-ops
PAIR_FMA = 33    # 3 sub, r2 (5), denom (2), c (5), a/b/t (6), accum 3x(4)
PAIR_DIV = 1
PAIR_SQRT = 1


def main():
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform})")
    x = jnp.asarray(np.random.default_rng(0).random(N, np.float32) + 0.5)

    r_fma = _rate(fma_chain, x, 2 * K)     # mul+add per step
    r_div = _rate(div_chain, x, K)
    r_sqrt = _rate(sqrt_chain, x, K)
    print(f"measured ceilings: fma {r_fma/1e12:.2f} Tops/s | "
          f"div {r_div/1e9:.1f} G/s | sqrt {r_sqrt/1e9:.1f} G/s")

    serial = 1.0 / (PAIR_FMA / r_fma + PAIR_DIV / r_div + PAIR_SQRT / r_sqrt)
    parallel = min(r_fma / PAIR_FMA, r_div / PAIR_DIV, r_sqrt / PAIR_SQRT)
    print(f"pair-rate bounds: serial-unit {serial/1e9:.1f} Gpairs/s | "
          f"bottleneck-unit {parallel/1e9:.1f} Gpairs/s")

    # achieved, same workload as bench.py (100k x 100k)
    from dipole_tpu.ops import fields

    pc = np.random.default_rng(1).normal(size=(100352, 6)).astype(np.float32)
    pc[:, 3:] /= np.linalg.norm(pc[:, 3:], axis=1, keepdims=True)
    np.asarray(fields.field_grad(pc, pc[:, :3]))
    t0 = time.perf_counter()
    for _ in range(3):
        out = np.asarray(fields.field_grad(pc, pc[:, :3]))
    dt = (time.perf_counter() - t0) / 3
    achieved = len(pc) ** 2 / dt
    print(f"achieved field_grad 100k^2: {achieved/1e9:.1f} Gpairs/s "
          f"({achieved/serial*100:.0f}% of serial bound, "
          f"{achieved/parallel*100:.0f}% of bottleneck bound)")
    print("implied unit utilization at the achieved rate: "
          f"fma {achieved*PAIR_FMA/r_fma*100:.0f}% | "
          f"div {achieved*PAIR_DIV/r_div*100:.0f}% | "
          f"sqrt {achieved*PAIR_SQRT/r_sqrt*100:.0f}% "
          "(>100% on a unit means the chain benchmark under-measures that "
          "ceiling; the largest number is the binding unit)")


if __name__ == "__main__":
    main()
