"""Server micro-batching: coalesce concurrent same-shape requests into one
vmapped device program.

The reference's parallel server (socket_server_para.py:200-211) overlaps
requests with threads but dispatches every request's GPU work serially; on
one chip that serializes the propagation scans. Here concurrent requests to
the same function with equal config and a shared padding bucket are fused:
the first thread in becomes the batch leader, waits a few milliseconds for
followers, then runs ONE vmapped scan for the whole batch
(ops/propagate.greedy_sign_sequence_batched) and one vmapped sign fix
(ops/fields.measure_mean_potential_batched). B requests cost ~one request's
sequential latency instead of B.

Per-request results are independent of batch composition: each vmapped lane
reads only its own cloud.
"""
from __future__ import annotations

import threading
import time

import numpy as np

__all__ = ["MicroBatcher", "batched_simple_estimate", "batched_tree_xie"]

# HBM budget for one micro-batched replay: the (pow2(B), nb, nb) f32 lane
# buffer (built in place via a donated lane write, so no 2x stack copy; one
# extra (nb, nb) matrix is in flight during the build). 8 lanes at the 10k
# bucket = 8.6 GB buffer + 1.1 GB in-flight; at the 30k bucket this admits
# 2 lanes (12.9 GB peak, the proven serving ceiling).
MAX_REPLAY_ENTRIES = 8 * 16384 * 16384

# One replay batch at a time: the (pow2(B), nb, nb) buffer is budgeted in
# isolation, but leaders for DIFFERENT signatures (e.g. two C values at a
# 30k-class bucket) would otherwise build full-budget buffers concurrently
# and jointly overcommit HBM. Greedy/mean-potential batches are O(B*nb)
# and need no such guard.
_REPLAY_HBM_LOCK = threading.Lock()


class _Job:
    __slots__ = ("payload", "result", "error", "event")

    def __init__(self, payload):
        self.payload = payload
        self.result = None
        self.error = None
        self.event = threading.Event()


class MicroBatcher:
    """Coalesces submissions with equal signature into one runner call.

    submit(sig, payload, runner) blocks until the result for `payload` is
    ready. The first thread per signature becomes the leader: it sleeps
    `window_s` to let followers join, then pops up to `max_batch` jobs and
    calls runner([payloads]) -> [results]. Followers just wait. A runner
    exception is re-raised in every waiting thread."""

    def __init__(self, window_s: float = 0.01, max_batch: int = 8):
        self.window_s = float(window_s)
        self.max_batch = int(max_batch)
        self._lock = threading.Lock()
        self._queues: dict = {}
        self.batches_run = 0
        self.jobs_run = 0

    def submit(self, sig, payload, runner):
        job = _Job(payload)
        with self._lock:
            queue = self._queues.setdefault(sig, [])
            queue.append(job)
            leader = len(queue) == 1
        if not leader:
            job.event.wait()
            if job.error is not None:
                raise job.error
            return job.result

        if self.window_s > 0:
            time.sleep(self.window_s)
        # The leader drains the WHOLE queue in max_batch chunks: followers
        # beyond the first chunk (and any that join while a chunk runs) have
        # no leader of their own and would otherwise wait forever. The
        # signature entry is removed exactly when its queue empties, so a
        # post-drain submit becomes a fresh leader.
        while True:
            with self._lock:
                queue = self._queues.get(sig, [])
                jobs = queue[: self.max_batch]
                del queue[: self.max_batch]
                if not queue:
                    self._queues.pop(sig, None)
            if not jobs:
                break
            try:
                results = runner([j.payload for j in jobs])
                if len(results) != len(jobs):
                    raise RuntimeError(
                        f"batch runner returned {len(results)} results for "
                        f"{len(jobs)} jobs")
                for j, r in zip(jobs, results):
                    j.result = r
            except Exception as e:  # noqa: BLE001 — must release every waiter
                for j in jobs:
                    j.error = e
            finally:
                for j in jobs:
                    j.event.set()
            with self._lock:
                self.batches_run += 1
                self.jobs_run += len(jobs)
        # The leader's own job is normally in its first chunk, but a PREVIOUS
        # batch's leader may still be draining this sig and can pop it first
        # (this thread then sees an empty queue and exits the loop while the
        # other leader's runner is mid-flight). The event, not loop exit, is
        # the completion signal.
        job.event.wait()
        if job.error is not None:
            raise job.error
        return job.result


def _simple_core_batch(payloads):
    """Batched device core of simple_estimate: payloads are (pc, diffuse)
    with pc already normal-estimated and normalized; returns oriented pcs
    (still normalized — the caller inverts its own transform). diffuse is
    constant within a batch (it is part of the signature)."""
    from dipole_tpu.ops import propagate

    return propagate.orient_clouds_batched([p for p, _ in payloads],
                                           diffuse=payloads[0][1])


def _tree_xie_core_batch(payloads):
    """Batched device core of tree_xie_propagation: payloads are
    (pc, orders, diffuse, C); the vmapped lock-step replay runs all clouds
    at once, chunked to the HBM budget. Alignment/vote stay per-request."""
    from dipole_tpu.ops import propagate
    from dipole_tpu.ops.propagate import _bucket, _pow2

    out = [None] * len(payloads)
    i = 0
    while i < len(payloads):
        # the vmapped core pads the batch axis to a power of two, so budget
        # pow2(chunk) * max_bucket^2 — the memory actually allocated
        j = i
        nb_max = 0
        while j < len(payloads):
            nb = max(nb_max, _bucket(len(payloads[j][0]) + 1))
            if j > i and _pow2(j - i + 1) * nb * nb > MAX_REPLAY_ENTRIES:
                break
            nb_max = nb
            j += 1
        chunk = payloads[i:j]
        with _REPLAY_HBM_LOCK:
            flips = propagate.xie_in_order_batched(
                [p for p, _, _, _ in chunk], [o for _, o, _, _ in chunk],
                diffuse=chunk[0][2], C=chunk[0][3])
        for k, f in enumerate(flips):
            out[i + k] = f.T                              # (N, T)
        i = j
    return out


def batched_tree_xie(batcher: MicroBatcher, xyz_data, config):
    """tree_xie_propagation with the replay scans micro-batched. Host stages
    (normal estimation, transform, EMST + BFS orders, alignment + vote +
    sign fix) stay in the calling thread."""
    from dipole_tpu.ops import fields, propagate
    from dipole_tpu.ops.propagate import _bucket
    from dipole_tpu.serve.handlers import _prep

    times = int(config["times"])
    if times <= 0 or times % 2 != 1:
        raise ValueError("times must be a positive odd number")
    pc, transform = _prep(xyz_data, max_nn=config["max_nn"])
    diffuse = bool(config["diffuse"])
    C = float(config.get("C", 3))
    orders, _ = propagate.bfs_orders(pc, 0, times=times)
    sig = ("tree_xie", times, diffuse, C, _bucket(len(pc) + 1))
    flips = batcher.submit(sig, (pc, orders, diffuse, C),
                           _tree_xie_core_batch)
    pc, _ = propagate.align_and_vote(pc, flips)
    # the global sign fix is the last serialized device stage — batch it too
    sig_m = ("meanpot", -(-len(pc) // fields.BLOCK_S) * fields.BLOCK_S)
    mean = batcher.submit(sig_m, pc, _mean_potential_batch)
    if mean < 0:
        pc[:, 3:6] *= -1
    return transform.inverse(pc).astype(np.float64)


def _mean_potential_batch(payloads):
    from dipole_tpu.ops import fields

    return list(fields.measure_mean_potential_batched(payloads))


def batched_simple_estimate(batcher: MicroBatcher, xyz_data, config):
    """simple_estimate with the device stages micro-batched. Host stages
    (normal estimation, transform) stay in the calling thread so they still
    overlap across requests."""
    from dipole_tpu.ops.propagate import _bucket
    from dipole_tpu.serve.handlers import _prep

    pc, transform = _prep(xyz_data, max_nn=30)
    diffuse = bool(config.get("diffuse", True))
    sig = ("simple_estimate", diffuse, _bucket(len(pc)))
    oriented = batcher.submit(sig, (pc, diffuse), _simple_core_batch)
    return transform.inverse(oriented).astype(np.float64)
