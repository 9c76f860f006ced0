"""Prototype: MXU-accumulation variants of the Pallas field kernel.

Variant A (exact-R): pairwise R/r2/c on VPU exactly as today, but the three
output reductions become one (T,2S)@(2S,4) MXU matmul.
Variant B (expansion): r2/c from K=3 input matmuls (cancellation risk) +
the same output matmul — the all-MXU formulation.

Measures GPairs/s vs the current production kernel on the same panel, and
max |diff| / sign agreement of the resulting field.
"""
import sys, time
sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dipole_tpu.ops import fields_pallas as fp

T_BLK, S_BLK = fp.T_BLK, fp.S_BLK


def _field_kernel_mxu_exact(t_ref, s_ref, eps_ref, o_ref):
    eps = eps_ref[0, 0]
    tt = jnp.transpose(t_ref[:])                 # (T_BLK, 8)
    tx3 = tt[:, :3]
    n_chunks = s_ref.shape[1] // S_BLK

    def body(j, acc):
        off = pl.multiple_of(j * S_BLK, S_BLK)
        sc = s_ref[:, pl.ds(off, S_BLK)]          # (8, S)
        tx, ty, tz = tt[:, 0:1], tt[:, 1:2], tt[:, 2:3]
        sx, sy, sz = sc[0:1, :], sc[1:2, :], sc[2:3, :]
        px, py, pz = sc[3:4, :], sc[4:5, :], sc[5:6, :]
        Rx = sx - tx
        Ry = sy - ty
        Rz = sz - tz
        r2 = Rx * Rx + Ry * Ry + Rz * Rz
        zero = r2 == 0.0
        r = jnp.sqrt(r2)
        denom = r * r2 + eps
        c = px * Rx + py * Ry + pz * Rz
        safe_r2 = jnp.where(zero, 1.0, r2)
        t1 = 1.0 / (safe_r2 * denom)
        a = jnp.where(zero, 0.0, 3.0 * c * t1)
        b = jnp.where(zero, 0.0, safe_r2 * t1)
        # E = sum b*p - a*R = (b @ p^T) - (a @ s^T) + (a @ 1) * t
        ab = jnp.concatenate([b, a], axis=1)              # (T, 2S)
        p_t = jnp.transpose(sc[3:6, :])                   # (S, 3)
        s_t = jnp.transpose(sc[0:3, :])                   # (S, 3)
        Wtop = jnp.concatenate([p_t, jnp.zeros((S_BLK, 1), jnp.float32)], 1)
        Wbot = jnp.concatenate([-s_t, jnp.ones((S_BLK, 1), jnp.float32)], 1)
        W = jnp.concatenate([Wtop, Wbot], axis=0)         # (2S, 4)
        out4 = jnp.dot(ab, W, preferred_element_type=jnp.float32)  # (T, 4)
        e3 = out4[:, :3] + out4[:, 3:4] * tx3
        return acc + jnp.concatenate(
            [e3, jnp.zeros((e3.shape[0], 5), jnp.float32)], axis=1)

    acc = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((t_ref.shape[1], 8), jnp.float32))
    o_ref[:] = jnp.transpose(acc)


def _field_kernel_mxu_expansion(t_ref, s_ref, eps_ref, o_ref):
    eps = eps_ref[0, 0]
    tt = jnp.transpose(t_ref[:])
    tx3 = tt[:, :3]
    t2 = jnp.sum(tx3 * tx3, axis=1, keepdims=True)        # (T, 1)
    n_chunks = s_ref.shape[1] // S_BLK

    def body(j, acc):
        off = pl.multiple_of(j * S_BLK, S_BLK)
        sc = s_ref[:, pl.ds(off, S_BLK)]
        s3 = sc[0:3, :]                                    # (3, S)
        p3 = sc[3:6, :]
        s2 = jnp.sum(s3 * s3, axis=0, keepdims=True)       # (1, S)
        ps = jnp.sum(p3 * s3, axis=0, keepdims=True)       # (1, S)
        ts = jnp.dot(tx3, s3, preferred_element_type=jnp.float32)  # (T, S)
        tp = jnp.dot(tx3, p3, preferred_element_type=jnp.float32)  # (T, S)
        r2 = t2 + s2 - 2.0 * ts
        c = ps - tp
        zero = r2 <= 0.0
        safe_r2 = jnp.where(zero, 1.0, r2)
        r = jnp.sqrt(safe_r2)
        denom = r * safe_r2 + eps
        t1 = 1.0 / (safe_r2 * denom)
        a = jnp.where(zero, 0.0, 3.0 * c * t1)
        b = jnp.where(zero, 0.0, safe_r2 * t1)
        ab = jnp.concatenate([b, a], axis=1)
        p_t = jnp.transpose(p3)
        s_t = jnp.transpose(s3)
        Wtop = jnp.concatenate([p_t, jnp.zeros((S_BLK, 1), jnp.float32)], 1)
        Wbot = jnp.concatenate([-s_t, jnp.ones((S_BLK, 1), jnp.float32)], 1)
        W = jnp.concatenate([Wtop, Wbot], axis=0)
        out4 = jnp.dot(ab, W, preferred_element_type=jnp.float32)
        e3 = out4[:, :3] + out4[:, 3:4] * tx3
        return acc + jnp.concatenate(
            [e3, jnp.zeros((e3.shape[0], 5), jnp.float32)], axis=1)

    acc = jax.lax.fori_loop(
        0, n_chunks, body, jnp.zeros((t_ref.shape[1], 8), jnp.float32))
    o_ref[:] = jnp.transpose(acc)


def make_padded(kernel):
    @partial(jax.jit, static_argnames=())
    def padded(src8, tgt8, eps):
        nT = tgt8.shape[1] // T_BLK
        return pl.pallas_call(
            kernel,
            grid=(nT,),
            in_specs=[
                pl.BlockSpec((8, T_BLK), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((8, T_BLK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, tgt8.shape[1]), jnp.float32),
        )(tgt8, src8, eps)
    return padded


def main():
    n_tgt, n_src = 65536, 262144
    rng = np.random.default_rng(0)
    src = rng.normal(size=(n_src, 6)).astype(np.float32) * 0.3
    src[:, 3:] /= np.linalg.norm(src[:, 3:], axis=1, keepdims=True)
    tgt = rng.normal(size=(n_tgt, 3)).astype(np.float32) * 0.3

    sp = -((-n_src) // S_BLK) * S_BLK
    tp = -((-n_tgt) // T_BLK) * T_BLK
    src8 = jnp.asarray(fp._to_channel_major(src, sp, sentinel_pos=True))
    tgt8 = jnp.asarray(fp._to_channel_major(tgt, tp, sentinel_pos=True))
    eps = jnp.full((1, 1), 1e-5, jnp.float32)

    variants = {
        "current": fp._field_pallas_padded,
        "mxu_exact": make_padded(_field_kernel_mxu_exact),
        "mxu_expansion": make_padded(_field_kernel_mxu_expansion),
    }
    results = {}
    for name, fn in variants.items():
        t0 = time.perf_counter()
        out = np.asarray(fn(src8, tgt8, eps))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            out = np.asarray(fn(src8, tgt8, eps))
            best = min(best, time.perf_counter() - t0)
        gpairs = n_tgt * n_src / best / 1e9
        results[name] = (out[:3, :n_tgt].T, gpairs, compile_s)
        print(f"{name:15s}: {gpairs:8.1f} GPairs/s  (compile {compile_s:.1f}s)")

    ref = results["current"][0]
    for name in ["mxu_exact", "mxu_expansion"]:
        out = results[name][0]
        denom = np.abs(ref).max()
        maxdiff = np.abs(out - ref).max() / denom
        # sign of E.n agreement with random unit n per target
        nrm = rng.normal(size=(n_tgt, 3)).astype(np.float32)
        nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
        s_ref = np.sign((ref * nrm).sum(1))
        s_out = np.sign((out * nrm).sum(1))
        agree = (s_ref == s_out).mean()
        print(f"{name:15s}: rel max diff {maxdiff:.2e}, interaction-sign agreement {agree:.6f}")


if __name__ == "__main__":
    main()
