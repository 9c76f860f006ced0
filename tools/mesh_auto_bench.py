"""A/B each mesh-shardable stage against its single-chip path on the
virtual 8-device CPU mesh — the measurements behind the `--mesh auto`
per-stage decision table (api.stage_mesh, VERDICT r3 item 6).

Run: python tools/mesh_auto_bench.py [n_devices]
(forces JAX_PLATFORMS=cpu + xla_force_host_platform_device_count before
jax initializes, like tests/conftest.py)

On a real multi-chip pod, unset the CPU forcing below (pass a real mesh
size and edit the two jax.config lines) and re-run: the final block prints
the decision table in the exact markdown form `api.stage_mesh`'s docstring
carries, so re-deriving the table from ICI measurements is one command +
one paste (VERDICT r4 item 7).
"""
import os
import sys
import time

N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={N_DEV}").strip()

from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def timed(fn, reps=3):
    fn()  # compile
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def make_cloud(n, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pc = np.concatenate([v + rng.normal(scale=0.01, size=(n, 3)), v], axis=1)
    return pc.astype(np.float32)


def main():
    from dipole_tpu.ops import fields, propagate
    from dipole_tpu.parallel import sharding

    mesh = sharding.make_mesh(N_DEV)
    platform = jax.devices()[0].platform
    print(f"mesh: {mesh.devices.size} devices ({platform})")
    rows = []  # (stage, measurement text, pick) -> docstring-format table

    def ab(stage, label, t1, t2):
        pick = "single" if t1 <= t2 else "sharded"
        print(f"{stage} {label}: single {t1:.3f}s  sharded {t2:.3f}s  "
              f"-> {pick}")
        rows.append((stage, f"{label}: {t1:.1f} vs {t2:.1f} s", pick))

    # 1. sequential greedy: single-chip scan vs distributed loop
    for n in (2048, 8192):
        pc = make_cloud(n)
        t1 = timed(lambda: propagate.greedy_sign_sequence(pc)[1])
        t2 = timed(lambda: sharding.greedy_sign_sequence_sharded(pc, mesh)[1])
        ab("greedy", f"{n//1024}k", t1, t2)

    # 2. patch propagation: mesh vs none
    for n, parts in ((10000, 8),):
        pc = make_cloud(n)
        seg = np.minimum((pc[:, 0] * 1e6).astype(np.int64) % parts, parts - 1)
        patches = [np.flatnonzero(seg == p) for p in range(parts)]
        pidx = [(i, p) for i, p in enumerate(patches)]
        t1 = timed(lambda: propagate.strongest_field_propagation_patches(
            pc.copy(), pidx, patches, diffuse=True))
        t2 = timed(lambda: propagate.strongest_field_propagation_patches(
            pc.copy(), pidx, patches, diffuse=True, mesh=mesh))
        ab("patch", f"{n//1000}k/{parts} patches", t1, t2)

    # 3. ensemble forward: mesh vs none
    from dipole_tpu import train
    from dipole_tpu.models.pointcnn import PointCNNParams
    from dipole_tpu.models.inference import ensemble_vote_patches

    params = train.init_params(jax.random.PRNGKey(0))
    model = PointCNNParams(params={k: np.asarray(v) for k, v in params.items()},
                           pool=0.6)
    rng = np.random.default_rng(1)
    patches = [make_cloud(int(rng.integers(300, 512)), seed=i)
               for i in range(16)]
    t1 = timed(lambda: ensemble_vote_patches([model], patches)[0][1])
    t2 = timed(lambda: ensemble_vote_patches([model], patches, mesh=mesh)[0][1])
    ab("ensemble", "16 patches", t1, t2)

    # 4. replay: single vs column-sharded
    for n in (2048,):
        pc = make_cloud(n)
        orders = np.stack([np.random.default_rng(s).permutation(n)
                           for s in range(3)])
        t1 = timed(lambda: propagate.xie_propagation_in_order(
            pc, orders, diffuse=True))
        t2 = timed(lambda: sharding.xie_in_order_sharded(
            pc, orders, mesh, diffuse=True))
        ab("replay", f"{n//1024}k/T=3", t1, t2)

    # 5. sign fix (mean potential on the 10^3 lattice)
    from dipole_tpu.utils.io import gen_grid

    for n in (100000,):
        pc = make_cloud(n)
        grid = gen_grid(10)
        t1 = timed(lambda: fields.measure_mean_potential(pc))
        t2 = timed(lambda: sharding.potential_sharded(pc, grid, mesh).mean())
        ab("sign_fix", f"{n//1000}k", t1, t2)

    # 6. field eval (reference-field transfer class)
    for n in (65536,):
        pc = make_cloud(n)
        tgt = make_cloud(8192, seed=9)[:, :3]
        t1 = timed(lambda: fields.field_grad(pc, tgt))
        t2 = timed(lambda: sharding.field_grad_sharded(pc, tgt, mesh))
        ab("field", f"{n//1024}k x 8k", t1, t2)

    # decision table in the exact form api.stage_mesh's docstring carries —
    # paste this block into the docstring when re-deriving on real ICI
    print(f"\ndecision table ({mesh.devices.size}-way {platform} mesh):")
    print("| stage    | measurement                                "
          "| auto picks |")
    print("|----------|--------------------------------------------"
          "|------------|")
    by_stage = {}
    for stage, meas, pick in rows:
        by_stage.setdefault(stage, [[], set()])
        by_stage[stage][0].append(meas)
        by_stage[stage][1].add(pick)
    for stage, (meas, picks) in by_stage.items():
        pick = picks.pop() if len(picks) == 1 else "MIXED"
        label = pick + (" (wins)" if pick == "sharded" else "")
        print(f"| {stage:<8s} | {'; '.join(meas):<42s} | {label:<10s} |")


if __name__ == "__main__":
    main()
