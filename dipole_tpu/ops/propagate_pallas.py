"""The strongest-field greedy propagation as a single Pallas TPU kernel.

The XLA scan in ops/propagate.py pays per-step while-loop overhead (~165 us
at 131k points — 21 s for a 100k cloud). Here the whole sequential loop runs
inside one kernel: the cloud lives in VMEM as six (8, M) channel planes
(point i at row i//M, col i%M), the accumulator/sign/visited state are loop
values, and each step is pure VPU work — masked argmax over (8, M), masked-
reduction reads of the chosen point's channels (Mosaic has no dynamic_slice
on values), and a fused field-column update. Decision semantics are
identical to ops/propagate (ties resolve to the lowest point index).

Capacity: cloud+state is ~9 (8, M) f32 planes = 36 * N bytes, so ~300k
points fit VMEM; beyond that the dispatch layer falls back to the XLA scan.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["greedy_sign_sequence_pallas", "MAX_PALLAS_GREEDY",
           "greedy_sign_sequence_pallas_streamed", "MAX_PALLAS_STREAMED",
           "greedy_sign_sequence_pallas_xl", "MAX_PALLAS_XL"]

_SENTINEL = 1.0e6
# VMEM ceiling for the fully-resident kernel, MEASURED (2026-08-17): the
# 262144 bucket is rejected by the compiler (scoped vmem 24.89M > 16M —
# cloud planes + state + step temps), so the resident kernel stops at the
# 131072 bucket (the 100k-class measurements); the HBM-streamed kernel
# below takes over beyond it.
MAX_PALLAS_GREEDY = 131072
_NEG = -3.0e38
_IMAX = np.int32(2**31 - 1)


def _greedy_kernel(pts_ref, scal_ref, acc_ref, sign_ref):
    """pts_ref (48, M): six channel planes [x, y, z, px, py, pz], 8 sublanes
    each. scal_ref (1, 2) SMEM: [start, eps]. Outputs acc, sign (8, M)."""
    M = pts_ref.shape[1]
    x = pts_ref[0:8, :]
    y = pts_ref[8:16, :]
    z = pts_ref[16:24, :]
    px = pts_ref[24:32, :]
    py = pts_ref[32:40, :]
    pz = pts_ref[40:48, :]
    eps = scal_ref[0, 1]
    start = scal_ref[0, 0].astype(jnp.int32)

    rows = jax.lax.broadcasted_iota(jnp.int32, (8, M), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (8, M), 1)
    flat = rows * M + cols

    def column(hit):
        """Interaction of the hit-marked source point at every point."""
        pick = lambda plane: jnp.sum(jnp.where(hit, plane, 0.0))
        sx, sy, sz = pick(x), pick(y), pick(z)
        spx, spy, spz = pick(px), pick(py), pick(pz)
        Rx = sx - x
        Ry = sy - y
        Rz = sz - z
        r2 = Rx * Rx + Ry * Ry + Rz * Rz
        zero = r2 == 0.0
        rr = jnp.sqrt(r2)
        denom = rr * r2 + eps
        cdot = spx * Rx + spy * Ry + spz * Rz
        Rn = px * Rx + py * Ry + pz * Rz
        pn = spx * px + spy * py + spz * pz
        safe_r2 = jnp.where(zero, 1.0, r2)
        t = 1.0 / (safe_r2 * denom)              # single divide per pair
        col = -t * (3.0 * cdot * Rn - pn * safe_r2)
        col = jnp.where(zero, 0.0, col)
        return jnp.where(jnp.isfinite(col), col, 0.0)

    # validity: sentinel-positioned padding starts visited
    hit0 = flat == start
    visited0 = jnp.where(x >= _SENTINEL, 1.0, 0.0)
    visited0 = jnp.where(hit0, 1.0, visited0)
    sign0 = jnp.where(hit0, 1.0, 0.0)
    acc0 = column(hit0)

    def step(_, carry):
        acc, sign, visited = carry
        masked = jnp.where(visited > 0, _NEG, jnp.abs(acc))
        m = jnp.max(masked)
        cand = jnp.where(masked == m, flat, _IMAX)
        c = jnp.min(cand)
        live = m > _NEG / 2
        hit = flat == c
        acc_c = jnp.sum(jnp.where(hit, acc, 0.0))
        s = jnp.where(acc_c < 0, -1.0, 1.0)
        sign = jnp.where(hit & live, s, sign)
        visited = jnp.where(hit, 1.0, visited)
        # dead steps (every real point visited; only bucket padding remains)
        # skip the O(N) column eval — power-of-two padding then costs ~3
        # cheap passes per step instead of the full interaction column
        acc = jax.lax.cond(live, lambda a: a + s * column(hit),
                           lambda a: a, acc)
        return acc, sign, visited

    acc, sign, _ = jax.lax.fori_loop(0, M * 8 - 1, step, (acc0, sign0, visited0))
    acc_ref[:] = acc
    sign_ref[:] = sign


@partial(jax.jit, static_argnames=())
def _greedy_pallas_padded(pts48: jnp.ndarray, scal: jnp.ndarray):
    M = pts48.shape[1]
    return pl.pallas_call(
        _greedy_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, M), jnp.float32),
            jax.ShapeDtypeStruct((8, M), jnp.float32),
        ),
    )(pts48, scal)


def _bucket(n: int, base: int = 1024) -> int:
    b = base
    while b < n:
        b *= 2
    return b


def greedy_sign_sequence_pallas(pts, starting_point: int = 0, eps: float = 1e-6):
    """(acc, sign) with the same decisions as propagate.greedy_sign_sequence."""
    pts = np.asarray(pts, np.float32)
    n = len(pts)
    nb = _bucket(max(n, 1024))
    M = nb // 8
    planes = np.zeros((48, M), np.float32)
    for ch in range(6):
        col = np.full(nb, _SENTINEL if ch < 3 else 0.0, np.float32)
        col[:n] = pts[:, ch]
        planes[ch * 8:(ch + 1) * 8] = col.reshape(8, M)
    scal = np.array([[float(starting_point), eps]], np.float32)
    acc8, sign8 = _greedy_pallas_padded(jnp.asarray(planes), jnp.asarray(scal))
    acc = np.asarray(acc8).reshape(-1)[:n]
    sign = np.asarray(sign8).reshape(-1)[:n]
    return acc, sign


# ---------------------------------------------------------------------------
# HBM-streamed greedy: capacity beyond the VMEM-resident kernel
# ---------------------------------------------------------------------------

# The VMEM-resident kernel caps at MAX_PALLAS_GREEDY because cloud + state
# must co-reside on chip. Streaming the cloud from HBM leaves only the
# accumulator and the visited/sign plane resident (8 bytes/point), so the
# ceiling becomes VMEM/8 ~ 1M points; the cloud's six channel planes are
# double-buffered through VMEM in _STREAM_CHUNK-lane panels each step
# (flash-attention-style). HBM traffic is 24*N bytes/step — the same O(N^2)
# pair work as any exact greedy, at HBM bandwidth instead of scan overhead.
MAX_PALLAS_STREAMED = 1048576
# Lanes per double-buffered panel. Bigger panels amortize DMA issue overhead:
# measured at 300k (warm, v5e) 2048 -> 7.15 s, 4096 -> 5.82 s, 8192 -> 5.07 s
# (1.4x; a 16384 panel is faster still but exceeds the 16 MB scoped-VMEM
# budget next to the 1M bucket's resident acc+state planes, and does not
# divide every 64k-multiple bucket's M). 8192 divides M for every bucket
# this wrapper emits and keeps VMEM at ~12 MB worst-case; the kernel halves
# the panel until it divides M, so no lane can be silently skipped.
_STREAM_CHUNK = 8192                     # lanes per panel: (48, 8192) = 1.5 MB


def _greedy_streamed_kernel(scal_ref, pts_hbm, acc_in, state_in,
                            acc_ref, state_ref):
    """One SEGMENT of the streamed greedy loop (the full chain is host-driven
    as bounded-duration launches — a single ~70 s launch at the 1M bucket
    reproducibly kills the TPU worker, while <=40 s launches run fine).

    scal_ref (1, 6) f32 SMEM: [start, eps, n_real, init_flag, nsteps, unused]
    (ints exact in f32 up to 2^24 >> MAX_PALLAS_STREAMED).
    pts_hbm (48, M) ANY/HBM: six channel planes as in the resident kernel.
    acc_in/state_in (ANY/HBM): the previous segment's outputs, DMA'd into
    the VMEM out refs at segment start (HBM carry keeps the resident
    footprint at one acc+state pair — VMEM inputs alongside the outputs
    blow the 16M scoped budget at the 1M bucket).
    init_flag=1 seeds state + the start point's column instead.
    acc_ref (8, M) VMEM out: accumulated interaction so far.
    state_ref (8, M) VMEM out: 0 = unvisited, +-1 = visited with that sign
    (padding rows are parked at +2 so they are never selected)."""
    M = acc_ref.shape[1]
    chunk = min(_STREAM_CHUNK, M)
    while M % chunk:  # a non-dividing panel would silently skip M % chunk lanes
        chunk //= 2
    K = M // chunk
    start = scal_ref[0, 0].astype(jnp.int32)
    eps = scal_ref[0, 1]
    n_real = scal_ref[0, 2].astype(jnp.int32)
    init_flag = scal_ref[0, 3] > 0.5
    nsteps = scal_ref[0, 4].astype(jnp.int32)

    # Selection/init/update all work per (8, chunk) slice — full-width
    # (8, M) temporaries would blow the scoped-VMEM budget at the 1M bucket
    # (measured: 16.62M > 16M with (8, 131072) iota/mask temps), while the
    # chunked form keeps scoped usage O(chunk) + the two (8, M) outputs.
    crows = jax.lax.broadcasted_iota(jnp.int32, (8, chunk), 0)
    clanes = jax.lax.broadcasted_iota(jnp.int32, (8, chunk), 1)

    def flat_chunk(base):
        """Global flat index (row * M + col) of the (8, chunk) slice whose
        first lane is `base`."""
        return crows * M + base + clanes

    def body(bufs, bsem, cur, csem, isem):
        curlanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        currows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)

        def fetch_point(c):
            """DMA the 128-lane-aligned (48, 128) panel holding the chosen
            point (the HBM tile is (8, 128) — single-lane slices are not
            sliceable); select its (sublane, lane) element. Returns the six
            channel scalars."""
            lane = c % M
            base = (lane // 128) * 128
            dma = pltpu.make_async_copy(
                pts_hbm.at[:, pl.ds(base, 128)], cur, csem)
            dma.start()
            dma.wait()
            hit = (currows == c // M) & (curlanes == lane - base)

            def pick(ch):
                return jnp.sum(jnp.where(hit, cur[ch * 8:(ch + 1) * 8, :], 0.0))

            return (pick(0), pick(1), pick(2), pick(3), pick(4), pick(5))

        def chunk_dma(slot, k):
            return pltpu.make_async_copy(
                pts_hbm.at[:, pl.ds(k * chunk, chunk)],
                bufs.at[slot], bsem.at[slot])

        def sweep(sv, upd, init: bool):
            """acc[:, k*chunk:(k+1)*chunk] (+)= upd * column(source sv) for
            every chunk, double-buffered. init=True writes instead of adds
            (a static Python flag: two sweep bodies are traced)."""
            sx, sy, sz, spx, spy, spz = sv
            chunk_dma(0, 0).start()

            def cbody(k, _):
                slot = jax.lax.rem(k, 2)

                @pl.when(k + 1 < K)
                def _():
                    chunk_dma(jax.lax.rem(k + 1, 2), k + 1).start()

                pltpu.make_async_copy(
                    pts_hbm.at[:, pl.ds(k * chunk, chunk)],
                    bufs.at[slot], bsem.at[slot]).wait()
                buf = bufs[slot]
                x = buf[0:8, :]
                y = buf[8:16, :]
                z = buf[16:24, :]
                px = buf[24:32, :]
                py = buf[32:40, :]
                pz = buf[40:48, :]
                Rx = sx - x
                Ry = sy - y
                Rz = sz - z
                r2 = Rx * Rx + Ry * Ry + Rz * Rz
                zero = r2 == 0.0
                rr = jnp.sqrt(r2)
                denom = rr * r2 + eps
                cdot = spx * Rx + spy * Ry + spz * Rz
                Rn = px * Rx + py * Ry + pz * Rz
                pn = spx * px + spy * py + spz * pz
                safe_r2 = jnp.where(zero, 1.0, r2)
                t = 1.0 / (safe_r2 * denom)
                col = -t * (3.0 * cdot * Rn - pn * safe_r2)
                col = jnp.where(zero, 0.0, col)
                col = jnp.where(jnp.isfinite(col), col, 0.0)
                sl = pl.ds(k * chunk, chunk)
                if init:
                    acc_ref[:, sl] = upd * col
                else:
                    acc_ref[:, sl] = acc_ref[:, sl] + upd * col
                return 0

            jax.lax.fori_loop(0, K, cbody, 0)

        # continuation segments: DMA the carried-in state (HBM residents —
        # VMEM inputs would double the resident footprint past the 16M
        # scoped budget at the 1M bucket; measured 16.07M) into the VMEM
        # out refs. One 2x(8, M) copy per multi-second launch: negligible.
        @pl.when(jnp.logical_not(init_flag))
        def _():
            d0 = pltpu.make_async_copy(acc_in, acc_ref, isem)
            d0.start()
            d0.wait()
            d1 = pltpu.make_async_copy(state_in, state_ref, isem)
            d1.start()
            d1.wait()

        # init (first segment only): start point visited at +1, padding
        # parked at +2, acc = the start point's column
        @pl.when(init_flag)
        def _():
            def init_state(k, _):
                sl = pl.ds(k * chunk, chunk)
                fl = flat_chunk(k * chunk)
                state_ref[:, sl] = jnp.where(
                    fl == start, 1.0, jnp.where(fl >= n_real, 2.0, 0.0))
                return 0

            jax.lax.fori_loop(0, K, init_state, 0)
            sweep(fetch_point(start), jnp.float32(1.0), True)

        def step(_, __):
            # chunked argmax with the resident kernel's exact tie-break
            # (min flat index among equal maxima): merge (max, min-index)
            # per chunk
            def sel(k, carry):
                m, c = carry
                sl = pl.ds(k * chunk, chunk)
                masked = jnp.where(state_ref[:, sl] != 0.0, _NEG,
                                   jnp.abs(acc_ref[:, sl]))
                lm = jnp.max(masked)
                lc = jnp.min(jnp.where(masked == lm, flat_chunk(k * chunk),
                                       _IMAX))
                c = jnp.where(lm > m, lc,
                              jnp.where(lm == m, jnp.minimum(c, lc), c))
                return jnp.maximum(m, lm), c

            m, c = jax.lax.fori_loop(
                0, K, sel, (jnp.float32(-jnp.inf), _IMAX))
            live = m > _NEG / 2
            # the winner's acc value + state flip touch only its owning
            # (8, chunk) slice
            base = (c % M) // chunk * chunk
            sl = pl.ds(base, chunk)
            fl = flat_chunk(base)
            hit = fl == c
            acc_c = jnp.sum(jnp.where(hit, acc_ref[:, sl], 0.0))
            s = jnp.where(acc_c < 0, -1.0, 1.0)
            state_ref[:, sl] = jnp.where(hit & live, s, state_ref[:, sl])

            # dead steps (only 64k-multiple bucket padding left) skip the
            # whole point fetch + O(N) HBM sweep — padding overhead drops
            # from a full sweep per padded slot to one chunked max/min pass
            @pl.when(live)
            def _():
                sweep(fetch_point(c), s, False)

            return 0

        jax.lax.fori_loop(0, nsteps, step, 0)

    pl.run_scoped(
        body,
        bufs=pltpu.VMEM((2, 48, chunk), jnp.float32),
        bsem=pltpu.SemaphoreType.DMA((2,)),
        cur=pltpu.VMEM((48, 128), jnp.float32),
        csem=pltpu.SemaphoreType.DMA(()),
        isem=pltpu.SemaphoreType.DMA(()),
    )


@partial(jax.jit, donate_argnums=(2, 3))
def _greedy_streamed_padded(planes: jnp.ndarray, scal: jnp.ndarray,
                            acc: jnp.ndarray, state: jnp.ndarray):
    M = planes.shape[1]
    return pl.pallas_call(
        _greedy_streamed_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, M), jnp.float32),
            jax.ShapeDtypeStruct((8, M), jnp.float32),
        ),
        grid=(),
    )(scal, planes, acc, state)


# Pair-work budget per segment launch: steps_per_launch = SEG_WORK // M,
# i.e. each launch sweeps ~2^34 source-target pairs ≈ 9-17 s of device time
# regardless of bucket — bounded well under the worker's launch-duration
# tolerance (a ~70 s single launch at the 1M bucket reproducibly crashed the
# worker; 38 s launches run fine; measured 2026-08-17).
SEG_WORK = 2**34


def greedy_sign_sequence_pallas_streamed(pts, starting_point: int = 0,
                                         eps: float = 1e-6):
    """(acc, sign) beyond the VMEM-resident ceiling: cloud streamed from HBM,
    only accumulator + sign state resident; the sequential chain is driven
    as bounded-duration segment launches with the greedy state aliased
    in place. Same decision semantics as every other greedy path."""
    pts = np.asarray(pts, np.float32)
    n = len(pts)
    if n > 65536:
        # every padded slot costs a cheap (skipped-sweep) sequential step, so
        # bucket to 64k multiples (<=21% overhead) instead of powers of two
        # (up to 75% at e.g. 300k); each bucket is one compile
        nb = -(-n // 65536) * 65536
    else:
        nb = _bucket(max(n, 1024))
    M = nb // 8
    planes = np.zeros((48, M), np.float32)
    for ch in range(6):
        col = np.full(nb, _SENTINEL if ch < 3 else 0.0, np.float32)
        col[:n] = pts[:, ch]
        planes[ch * 8:(ch + 1) * 8] = col.reshape(8, M)
    planes = jnp.asarray(planes)
    acc8 = jnp.zeros((8, M), jnp.float32)
    state8 = jnp.zeros((8, M), jnp.float32)
    total = nb - 1
    seg = max(1, SEG_WORK // M)
    done = 0
    while done < total:
        ns = min(seg, total - done)
        # n_real marks padding by flat index — valid because the plane
        # layout puts point i at (i // M, i % M), so flat >= n <=> padding
        scal = np.array([[float(starting_point), eps, float(n),
                          1.0 if done == 0 else 0.0, float(ns), 0.0]],
                        np.float32)
        acc8, state8 = _greedy_streamed_padded(planes, jnp.asarray(scal),
                                               acc8, state8)
        done += ns
    acc = np.asarray(acc8).reshape(-1)[:n]
    state = np.asarray(state8).reshape(-1)[:n]
    sign = np.where(state == -1.0, -1.0, np.where(state == 1.0, 1.0, 0.0))
    return acc, sign.astype(np.float32)


# ---------------------------------------------------------------------------
# XL greedy: acc/sign state HBM-resident too — capacity past the streamed
# kernel's VMEM/8-bytes-per-point ceiling (VERDICT r3 item 7)
# ---------------------------------------------------------------------------

# The streamed kernel keeps acc + state resident in VMEM (8 B/point), which
# caps it at ~1M points. Here those planes live in HBM as well and are
# windowed through VMEM panels inside the per-step sweep, so the ceiling
# becomes flat-index exactness in the f32 carry (2^24) and wall-clock, not
# memory. Selection is FUSED into the sweep: while chunk k's acc update is
# written back, its masked (max, min-index) is merged into the next step's
# winner — one pass over cloud (24 B/pt) + acc (8 B/pt r+w) + state
# (4 B/pt r) per step instead of the streamed kernel's 24 B/pt, i.e. ~1.5x
# the HBM traffic as the price of unbounded state.
MAX_PALLAS_XL = 2**24

# XL panels are wider than the streamed kernel's: with acc/state panels also
# in flight the per-chunk fixed DMA cost is 3x, so fewer/larger chunks win.
# (2, 48, 16384) pts + 3x(2, 8, 16384) panels = 9.4 MB scoped VMEM < 16 MB.
_XL_CHUNK = 16384


def _greedy_xl_kernel(scal_ref, pts_hbm, acc_in, state_in, carry_in,
                      acc_out, state_out, carry_ref):
    """One SEGMENT of the XL greedy chain (bounded-duration launches, like
    the streamed kernel).

    scal_ref (1, 6) f32 SMEM: [start, eps, n_real, init_flag, nsteps, 0].
    pts_hbm (48, M) ANY: six channel planes. acc_in/state_in (8, M) ANY:
    aliased in place to acc_out/state_out (input_output_aliases) — the
    greedy state never leaves HBM. carry_in (8, 128) VMEM: [m, c] of the
    pending selection at lanes (0,0)/(0,1) (c exact in f32 up to 2^24).
    carry_ref (8, 128) VMEM out: updated [m, c]."""
    M = acc_out.shape[1]
    chunk = min(_XL_CHUNK, M)
    while M % chunk:
        chunk //= 2
    K = M // chunk
    start = scal_ref[0, 0].astype(jnp.int32)
    eps = scal_ref[0, 1]
    n_real = scal_ref[0, 2].astype(jnp.int32)
    init_flag = scal_ref[0, 3] > 0.5
    nsteps = scal_ref[0, 4].astype(jnp.int32)

    crows = jax.lax.broadcasted_iota(jnp.int32, (8, chunk), 0)
    clanes = jax.lax.broadcasted_iota(jnp.int32, (8, chunk), 1)

    def flat_chunk(base):
        return crows * M + base + clanes

    def body(bufs, bsem, apan, aisem, awb, aosem, span, sisem,
             scur, sqsem, acur, asem, cur, csem):
        currows = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
        curlanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
        # Mosaic rejects scalar stores into VMEM refs, so the (m, c) carry
        # is always moved as a full (8, 128) plane: masked broadcast on
        # store, masked-sum extraction on load (interpret mode accepts the
        # scalar form, real lowering does not — r5 hardware finding).
        m_lane = (currows == 0) & (curlanes == 0)
        c_lane = (currows == 0) & (curlanes == 1)

        def carry_store(m, c):
            carry_ref[:, :] = jnp.where(
                m_lane, m, jnp.where(c_lane, c.astype(jnp.float32), 0.0))

        def carry_load():
            plane = carry_ref[:, :]
            m = jnp.sum(jnp.where(m_lane, plane, 0.0))
            c = jnp.sum(jnp.where(c_lane, plane, 0.0)).astype(jnp.int32)
            return m, c

        def fetch_point(c):
            lane = c % M
            base = (lane // 128) * 128
            dma = pltpu.make_async_copy(
                pts_hbm.at[:, pl.ds(base, 128)], cur, csem)
            dma.start()
            dma.wait()
            hit = (currows == c // M) & (curlanes == lane - base)

            def pick(ch):
                return jnp.sum(jnp.where(hit, cur[ch * 8:(ch + 1) * 8, :], 0.0))

            return (pick(0), pick(1), pick(2), pick(3), pick(4), pick(5))

        def fetch_acc(c):
            """The winner's accumulated interaction (128-lane panel DMA)."""
            lane = c % M
            base = (lane // 128) * 128
            dma = pltpu.make_async_copy(
                acc_out.at[:, pl.ds(base, 128)], acur, asem)
            dma.start()
            dma.wait()
            hit = (currows == c // M) & (curlanes == lane - base)
            return jnp.sum(jnp.where(hit, acur[:, :], 0.0))

        def flip_state(c, upd):
            """Flip the winner's HBM state in place via its 128-lane panel
            (read-modify-write). The only state write a step needs — the r4
            kernel's full-chunk write-back inside the sweep was one of the
            per-chunk blocking round trips behind its 25x hardware slowdown."""
            lane = c % M
            base = (lane // 128) * 128
            d_in = pltpu.make_async_copy(
                state_out.at[:, pl.ds(base, 128)], scur, sqsem)
            d_in.start()
            d_in.wait()
            hit = (currows == c // M) & (curlanes == lane - base)
            scur[:, :] = jnp.where(hit, upd, scur[:, :])
            d_out = pltpu.make_async_copy(
                scur, state_out.at[:, pl.ds(base, 128)], sqsem)
            d_out.start()
            d_out.wait()

        def pts_dma(slot, k):
            return pltpu.make_async_copy(
                pts_hbm.at[:, pl.ds(k * chunk, chunk)],
                bufs.at[slot], bsem.at[slot])

        def acc_dma(slot, k):
            return pltpu.make_async_copy(
                acc_in.at[:, pl.ds(k * chunk, chunk)],
                apan.at[slot], aisem.at[slot])

        def state_dma(slot, k):
            return pltpu.make_async_copy(
                state_in.at[:, pl.ds(k * chunk, chunk)],
                span.at[slot], sisem.at[slot])

        def accw_dma(slot, k):
            return pltpu.make_async_copy(
                awb.at[slot], acc_out.at[:, pl.ds(k * chunk, chunk)],
                aosem.at[slot])

        def column(buf, sv):
            """Dipole interaction column of source sv against one (48, chunk)
            cloud panel (same algebra as the streamed kernel)."""
            sx, sy, sz, spx, spy, spz = sv
            x = buf[0:8, :]
            y = buf[8:16, :]
            z = buf[16:24, :]
            px = buf[24:32, :]
            py = buf[32:40, :]
            pz = buf[40:48, :]
            Rx = sx - x
            Ry = sy - y
            Rz = sz - z
            r2 = Rx * Rx + Ry * Ry + Rz * Rz
            zero = r2 == 0.0
            rr = jnp.sqrt(r2)
            denom = rr * r2 + eps
            cdot = spx * Rx + spy * Ry + spz * Rz
            Rn = px * Rx + py * Ry + pz * Rz
            pn = spx * px + spy * py + spz * pz
            safe_r2 = jnp.where(zero, 1.0, r2)
            t = 1.0 / (safe_r2 * denom)
            col = -t * (3.0 * cdot * Rn - pn * safe_r2)
            col = jnp.where(zero, 0.0, col)
            return jnp.where(jnp.isfinite(col), col, 0.0)

        def merge(carry, masked, fl):
            """(max, min-index) tie-break merge — identical to every other
            greedy path (ties to the lowest flat index)."""
            m, c = carry
            lm = jnp.max(masked)
            lc = jnp.min(jnp.where(masked == lm, fl, _IMAX))
            c = jnp.where(lm > m, lc,
                          jnp.where(lm == m, jnp.minimum(c, lc), c))
            return jnp.maximum(m, lm), c

        def sweep_init(sv):
            """First-segment init: acc = start column, state seeded. Serial
            write waits (runs once per cloud — latency-irrelevant)."""
            pts_dma(0, 0).start()

            def cbody(k, carry):
                slot = jax.lax.rem(k, 2)

                @pl.when(k + 1 < K)
                def _():
                    pts_dma(jax.lax.rem(k + 1, 2), k + 1).start()

                pts_dma(slot, k).wait()
                acc_new = column(bufs[slot], sv)
                fl = flat_chunk(k * chunk)
                state_new = jnp.where(
                    fl == start, 1.0, jnp.where(fl >= n_real, 2.0, 0.0))
                awb[slot] = acc_new
                aw = accw_dma(slot, k)
                aw.start()
                span[slot] = state_new
                sw = pltpu.make_async_copy(
                    span.at[slot], state_out.at[:, pl.ds(k * chunk, chunk)],
                    sisem.at[slot])
                sw.start()
                carry = merge(carry, jnp.where(state_new != 0.0, _NEG,
                                               jnp.abs(acc_new)), fl)
                aw.wait()
                sw.wait()
                return carry

            return jax.lax.fori_loop(
                0, K, cbody, (jnp.float32(-jnp.inf), _IMAX))

        def sweep(sv, upd, flip_c):
            """acc[:, chunk k] += upd * column(sv) for every chunk, fusing
            the NEXT selection's masked (max, min-index) merge. Fully
            pipelined: pts/acc/state panels for chunk k+1 prefetch while
            chunk k computes, and chunk k's acc write-back is only waited on
            when its buffer slot is reused at k+2 — the r4 kernel's serial
            per-chunk round trips measured 25x slower than the streamed
            kernel on hardware (520 us/step vs 21 us/step at 200k)."""
            pts_dma(0, 0).start()
            acc_dma(0, 0).start()
            state_dma(0, 0).start()

            def cbody(k, carry):
                slot = jax.lax.rem(k, 2)

                @pl.when(k + 1 < K)
                def _():
                    nslot = jax.lax.rem(k + 1, 2)
                    pts_dma(nslot, k + 1).start()
                    acc_dma(nslot, k + 1).start()
                    state_dma(nslot, k + 1).start()

                # the slot's previous write-back must land before reuse
                @pl.when(k >= 2)
                def _():
                    accw_dma(slot, k - 2).wait()

                pts_dma(slot, k).wait()
                acc_dma(slot, k).wait()
                state_dma(slot, k).wait()
                acc_new = apan[slot] + upd * column(bufs[slot], sv)
                awb[slot] = acc_new
                accw_dma(slot, k).start()
                fl = flat_chunk(k * chunk)
                # the winner's flip is already in HBM (flip_state runs before
                # the sweep); the fl == flip_c guard is belt-and-braces for
                # panels fetched before the flip landed
                visited = (span[slot] != 0.0) | (fl == flip_c)
                carry = merge(carry, jnp.where(visited, _NEG,
                                               jnp.abs(acc_new)), fl)
                return carry

            out = jax.lax.fori_loop(
                0, K, cbody, (jnp.float32(-jnp.inf), _IMAX))
            accw_dma(jax.lax.rem(K - 1, 2), K - 1).wait()
            if K >= 2:
                accw_dma(jax.lax.rem(K - 2, 2), K - 2).wait()
            return out

        @pl.when(init_flag)
        def _():
            m0, c0 = sweep_init(fetch_point(start))
            carry_store(m0, c0)

        @pl.when(jnp.logical_not(init_flag))
        def _():
            carry_ref[:, :] = carry_in[:, :]

        def step(_, __):
            m, c = carry_load()
            live = m > _NEG / 2

            @pl.when(live)
            def _():
                acc_c = fetch_acc(c)
                s = jnp.where(acc_c < 0, -1.0, 1.0)
                flip_state(c, s)
                m2, c2 = sweep(fetch_point(c), s, c)
                carry_store(m2, c2)

            return 0

        jax.lax.fori_loop(0, nsteps, step, 0)

    pl.run_scoped(
        body,
        bufs=pltpu.VMEM((2, 48, chunk), jnp.float32),
        bsem=pltpu.SemaphoreType.DMA((2,)),
        apan=pltpu.VMEM((2, 8, chunk), jnp.float32),
        aisem=pltpu.SemaphoreType.DMA((2,)),
        awb=pltpu.VMEM((2, 8, chunk), jnp.float32),
        aosem=pltpu.SemaphoreType.DMA((2,)),
        span=pltpu.VMEM((2, 8, chunk), jnp.float32),
        sisem=pltpu.SemaphoreType.DMA((2,)),
        scur=pltpu.VMEM((8, 128), jnp.float32),
        sqsem=pltpu.SemaphoreType.DMA(()),
        acur=pltpu.VMEM((8, 128), jnp.float32),
        asem=pltpu.SemaphoreType.DMA(()),
        cur=pltpu.VMEM((48, 128), jnp.float32),
        csem=pltpu.SemaphoreType.DMA(()),
    )


@partial(jax.jit, donate_argnums=(2, 3))
def _greedy_xl_padded(planes: jnp.ndarray, scal: jnp.ndarray,
                      acc: jnp.ndarray, state: jnp.ndarray,
                      carry: jnp.ndarray):
    M = planes.shape[1]
    return pl.pallas_call(
        _greedy_xl_kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8, M), jnp.float32),
            jax.ShapeDtypeStruct((8, M), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
        ),
        input_output_aliases={2: 0, 3: 1},
        grid=(),
    )(scal, planes, acc, state, carry)


# XL segments pay ~1.5x the streamed kernel's HBM traffic per step, so the
# per-launch pair budget is halved to keep launch durations in the same
# measured-safe band (9-17 s).
SEG_WORK_XL = 2**33


def greedy_sign_sequence_pallas_xl(pts, starting_point: int = 0,
                                   eps: float = 1e-6):
    """(acc, sign) past the streamed kernel's ceiling: cloud AND greedy
    state stream through VMEM from HBM; nothing about the cloud size is
    VMEM-resident. Same decision semantics as every other greedy path
    (ties to the lowest flat index). Ceiling: MAX_PALLAS_XL (f32-exact
    flat indices in the carry)."""
    pts = np.asarray(pts, np.float32)
    n = len(pts)
    if n > MAX_PALLAS_XL:
        raise ValueError(f"n={n} exceeds MAX_PALLAS_XL={MAX_PALLAS_XL}")
    if n > 65536:
        nb = -(-n // 65536) * 65536
    else:
        nb = _bucket(max(n, 1024))
    M = nb // 8
    planes = np.zeros((48, M), np.float32)
    for ch in range(6):
        col = np.full(nb, _SENTINEL if ch < 3 else 0.0, np.float32)
        col[:n] = pts[:, ch]
        planes[ch * 8:(ch + 1) * 8] = col.reshape(8, M)
    planes = jnp.asarray(planes)
    acc8 = jnp.zeros((8, M), jnp.float32)
    state8 = jnp.zeros((8, M), jnp.float32)
    carry = jnp.zeros((8, 128), jnp.float32)
    total = nb - 1
    seg = max(1, SEG_WORK_XL // M)
    done = 0
    while done < total:
        ns = min(seg, total - done)
        scal = np.array([[float(starting_point), eps, float(n),
                          1.0 if done == 0 else 0.0, float(ns), 0.0]],
                        np.float32)
        acc8, state8, carry = _greedy_xl_padded(
            planes, jnp.asarray(scal), acc8, state8, carry)
        done += ns
    acc = np.asarray(acc8).reshape(-1)[:n]
    state = np.asarray(state8).reshape(-1)[:n]
    sign = np.where(state == -1.0, -1.0, np.where(state == 1.0, 1.0, 0.0))
    return acc, sign.astype(np.float32)
