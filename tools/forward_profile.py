"""Decompose the warm PointCNN forward cost into its stages.

The batched ensemble forward is the dominant warm stage of the lion demo
(BASELINE.md: ~15 s of ~20 s end-to-end). This tool times each geometry /
math component of one (B, bucket) forward chunk as separately-jitted
programs, so the optimization conversation ("is it the kNN scans, the FPS
loop, or the conv einsums?") is held with measurements instead of guesses.

The sum of parts exceeds the fused forward's time (XLA overlaps pieces the
split programs cannot), so read the rows as an upper-bound share per stage.

Usage: python tools/forward_profile.py [--batch 128] [--bucket 512]
"""
from __future__ import annotations

import argparse
import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _fetch(out):
    """Force device->host materialization: on the axon backend
    block_until_ready returns without draining the tunnel, so timing must
    fetch the bytes (measured: a 0.26 s forward 'completes' in 0.5 ms under
    block_until_ready alone)."""
    import jax

    return [np.asarray(x) for x in jax.tree.leaves(out)]


def _time(fn, *args, reps: int = 5) -> float:
    _fetch(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        _fetch(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--bucket", type=int, default=512)
    ap.add_argument("--pool", type=float, default=0.6)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dipole_tpu.models import pointcnn as pn
    from dipole_tpu import train

    B, nb, pool = args.batch, args.bucket, args.pool
    m1 = int(-(-nb * pool // 1))
    m2 = int(-(-m1 * pool // 1))
    params = train.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    pc = jnp.asarray(rng.normal(size=(B, nb, 6)).astype(np.float32))
    valid = jnp.ones((B, nb), bool)
    keys = jax.random.split(jax.random.PRNGKey(1), B)

    full = _time(
        lambda: pn._forward_batched(params, pc, valid, keys,
                                    jnp.float32(pool), m1, m2))
    print(f"full forward           B={B} bucket={nb}: {full * 1e3:8.1f} ms")

    canon = jax.jit(jax.vmap(pn._canonicalize))
    t = _time(lambda: canon(pc, valid))
    print(f"  canonicalize (eigh3x3 + rotate):        {t * 1e3:8.1f} ms")

    x1, pos1 = canon(pc, valid)

    @partial(jax.jit, static_argnames=("k",))
    def knn(pos, k: int):
        return jax.vmap(lambda q: pn._knn_self(q, k))(pos)

    # The three shared self-kNN searches the forward performs (one K=20 scan
    # per position set, shared by every stage on that set — the historical
    # per-stage decomposition had seven searches; pre-optimization numbers
    # are recorded in BASELINE.md's round-3 section).
    knn_specs = [("pos1 kNN (nb, K=20, enc1+dec3)", pos1, 20)]
    pos2 = pos1[:, :m1]
    pos3 = pos1[:, :m2]
    knn_specs += [("pos2 kNN (m1, K=20, enc2+dec2)", pos2, 20),
                  ("pos3 kNN (m2, K=20, enc3/4+dec1)", pos3, 20)]
    t_knn = 0.0
    for label, pos, k in knn_specs:
        t = _time(lambda pos=pos, k=k: knn(pos, k))
        t_knn += t
        print(f"  {label:38s}  {t * 1e3:8.1f} ms")

    @jax.jit
    def interp(x, src, dst):
        return jax.vmap(pn._interpolate)(x, src, dst)

    x3 = jnp.zeros((B, m2, 128), jnp.float32)
    x2 = jnp.zeros((B, m1, 64), jnp.float32)
    t_i1 = _time(lambda: interp(x3, pos3, pos2))
    t_i2 = _time(lambda: interp(x2, pos2, pos1))
    print(f"  interpolate m2->m1:                     {t_i1 * 1e3:8.1f} ms")
    print(f"  interpolate m1->nb:                     {t_i2 * 1e3:8.1f} ms")

    @partial(jax.jit, static_argnames=("m",))
    def fps(pos, v, m: int):
        return jax.vmap(lambda q, w: pn._fps_masked(q, w, m, 0))(pos, v)

    t_f1 = _time(lambda: fps(pos1, valid, m1))
    t_f2 = _time(lambda: fps(pos2, valid[:, :m1], m2))
    print(f"  FPS nb->m1:                             {t_f1 * 1e3:8.1f} ms")
    print(f"  FPS m1->m2:                             {t_f2 * 1e3:8.1f} ms")

    geom = t_knn + t_i1 + t_i2 + t_f1 + t_f2
    print(f"  -- neighbor search total:               {(t_knn + t_i1 + t_i2) * 1e3:8.1f} ms"
          f"  ({(t_knn + t_i1 + t_i2) / full:5.1%} of full)")
    print(f"  -- geometry total (kNN+interp+FPS):     {geom * 1e3:8.1f} ms"
          f"  ({geom / full:5.1%} of full)")
    print(f"  -- residual (conv math, overlap):       {(full - geom) * 1e3:8.1f} ms")


if __name__ == "__main__":
    main()
