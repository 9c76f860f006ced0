"""Pre-compile the framework's hot programs so first real runs are warm.

The axon TPU backend defers XLA compilation to first execution and the
compile happens server-side (minutes for the widest PointCNN programs, and
the local persistent cache cannot always avoid it). Running this once after
install — or after changing model pools / forward-width policy — walks the
standard program matrix:

  * dipole field/potential kernels at the Pallas block shapes
  * greedy propagation (matrix and on-the-fly) at small sizes
  * the batched PointCNN forward at every (bucket, width, pool) the demo
    suite reaches: (512, 0.6), (512, 0.99), (1024, 0.6), (1024, 0.99)

Tiny inputs are used everywhere — compile time depends on shapes, not
values. Expect ~5-15 minutes on a cold cache; reruns are seconds.

Usage: python tools/warm_compile_cache.py [--network-only]
"""
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


def _stage(label, fn):
    t0 = time.time()
    fn()
    print(f"  {label}: {time.time() - t0:.1f}s", flush=True)


def warm_kernels():
    import jax

    from dipole_tpu.ops import fields, propagate

    pc = _cloud(4096)
    big = _cloud(20000, 1)
    _stage("field_grad (XLA block path)",
           lambda: np.asarray(fields.field_grad(pc, pc[:, :3])))
    _stage("field_grad (Pallas panel path)",
           lambda: np.asarray(fields.field_grad(big, big[:, :3])))
    _stage("potential + lattice sign fix",
           lambda: fields.measure_mean_potential(pc))
    _stage("greedy propagation (matrix)",
           lambda: propagate.strongest_field_propagation_points(_cloud(2048)))
    _stage("greedy propagation (on-the-fly)",
           lambda: propagate.strongest_field_propagation_points(_cloud(16384, 2)))
    _stage("point-group interaction",
           lambda: np.asarray(fields.point_group_interaction(
               pc, np.arange(len(pc)) % 7, 7)))
    del jax


def warm_serving(n=10000):
    """The micro-batched serving cores at every batch shape the server can
    dispatch for n-class requests (pow2 batch axes; greedy only from B=2 —
    an uncontended request takes the serial dispatch) — so even the FIRST
    `dipole-server --warmup` start hits the persistent cache instead of
    multi-second compiles per shape."""
    from dipole_tpu.ops import fields, propagate

    pc = _cloud(n, 3)
    orders, _ = propagate.bfs_orders(pc, 0, times=3)
    for B in (1, 2, 4, 8):
        if B > 1:
            # B=1 simple_estimate takes the serial dispatch (warmed by
            # warm_kernels at this bucket), never the vmapped greedy
            _stage(f"serving greedy batch B={B}",
                   lambda B=B: propagate.greedy_sign_sequence_batched([pc] * B))
        _stage(f"serving replay batch B={B}",
               lambda B=B: propagate.xie_in_order_batched(
                   [pc] * B, [orders] * B, diffuse=True))
        _stage(f"serving sign-fix batch B={B}",
               lambda B=B: fields.measure_mean_potential_batched([pc] * B))


def warm_network(model_paths=None):
    import jax

    from dipole_tpu.models.pointcnn import (PointCNNParams, _bucket,
                                            pointcnn_logits_batched)
    from dipole_tpu import train

    pools = {}
    for p in model_paths or []:
        m = PointCNNParams.from_files(p)
        pools[m.pool] = m.params
    for pool in (0.6, 0.99):
        if pool not in pools:
            pools[pool] = train.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    for bucket in (512, 1024):
        # one full chunk at this bucket's width forces the widest program
        from dipole_tpu.models.pointcnn import _forward_width

        for pool, params in sorted(pools.items()):
            width = _forward_width(bucket, pool)
            patches = [
                _cloud(bucket // 2 + 1 if i == 0 else int(rng.integers(64, bucket)),
                       seed=i)
                for i in range(width)
            ]
            assert _bucket(max(len(p) for p in patches)) == bucket
            _stage(f"PointCNN forward bucket {bucket} width {width} pool {pool}",
                   lambda p=params, pool=pool, pat=patches:
                   pointcnn_logits_batched(p, pool, pat,
                                           key=jax.random.PRNGKey(0)))


_DEMO_SHAPES = {
    # shape -> (maker args, api call, demo flags) — EXACT demo-suite configs
    # (demos/*.sh): make_shape is deterministic per (shape, N), so the
    # warmed programs are bit-for-bit the ones the demo's first run needs.
    "lion": ("lion", 180000, "large",
             dict(iters=5, number_parts=41, minimum_points_per_patch=100,
                  n=50)),
    "alien": ("alien", 150000, "large",
              dict(iters=5, number_parts=41, minimum_points_per_patch=100,
                   curvature_threshold=0.01, estimate=True, n=50)),
    "vase": ("vase", 80000, "patches",
             dict(iters=5, propagation_iters=4, number_parts=25,
                  minimum_points_per_patch=100, weighted_prop=True,
                  estimate=True, diffuse=True)),
}


def warm_demos(names, model_paths):
    """Run each demo config once on its exact synthesized cloud (results
    discarded): the workload's size-specific panels — field programs at the
    cloud's padded row counts, group-interaction at its rep counts, the
    ensemble programs at its patch buckets — compile now instead of on the
    user's first demo run (VERDICT r2 item 7)."""
    from dipole_tpu import api
    from tools.make_shape import SHAPES

    for name in names:
        shape, n, method, kw = _DEMO_SHAPES[name]
        pc = SHAPES[shape](n, 0)

        def run(pc=pc, method=method, kw=kw):
            if method == "large":
                api.orient_large(pc, models=model_paths, **kw)
            else:
                api.orient_patches(pc, models=model_paths, **kw)

        _stage(f"demo '{name}' ({n} pts, {method})", run)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    t0 = time.time()
    ref = Path("/root/reference/pre_trained")
    models = sorted(ref.glob("*.pt")) if ref.exists() else []
    if "--network-only" not in argv:
        print("kernels:", flush=True)
        warm_kernels()
        print("serving batch shapes:", flush=True)
        warm_serving()
    print("network programs:", flush=True)
    warm_network(models)
    demos = [a.split("=", 1)[1] for a in argv if a.startswith("--demos=")]
    if demos:
        names = [d for arg in demos for d in arg.split(",") if d]
        print("demo-suite shapes:", flush=True)
        warm_demos(names, models)
    print(f"cache warm in {time.time() - t0:.0f}s total", flush=True)


if __name__ == "__main__":
    main()
