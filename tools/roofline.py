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

K = 256          # chained ops per element
N = 1 << 22      # elements (16 MiB f32)


def _rate(fn, x, ops_per_elem, iters=5):
    y = fn(x)
    y.block_until_ready()
    np.asarray(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(x)
    np.asarray(y)
    dt = (time.perf_counter() - t0) / iters
    return x.size * ops_per_elem / dt


@jax.jit
def fma_chain(x):
    for _ in range(K):
        x = x * 1.0000001 + 1e-9
    return x


@jax.jit
def div_chain(x):
    for _ in range(K):
        x = 1.02 / (x + 1.0)
    return x


@jax.jit
def sqrt_chain(x):
    for _ in range(K):
        x = jnp.sqrt(x + 1.0001)
    return x


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

    # achieved, same workload class as bench.py
    from dipole_tpu.ops import fields

    pc = np.random.default_rng(1).normal(size=(65536, 6)).astype(np.float32)
    pc[:, 3:] /= np.linalg.norm(pc[:, 3:], axis=1, keepdims=True)
    np.asarray(fields.field_grad(pc, pc[:, :3]))
    t0 = time.perf_counter()
    for _ in range(3):
        out = np.asarray(fields.field_grad(pc, pc[:, :3]))
    dt = (time.perf_counter() - t0) / 3
    achieved = len(pc) ** 2 / dt
    print(f"achieved field_grad: {achieved/1e9:.1f} Gpairs/s "
          f"({achieved/serial*100:.0f}% of serial bound, "
          f"{achieved/parallel*100:.0f}% of bottleneck bound)")


if __name__ == "__main__":
    main()
