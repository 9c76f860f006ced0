"""Adversarial concurrency tests for the serving micro-batch layer.

The MicroBatcher admits several thread interleavings that serial unit tests
never hit (leaders draining across batch generations, mixed signatures,
chunked drains, exceptions mid-queue). These tests hammer those paths:
a property-style fuzz of the batcher itself, and a live-TCP soak of the
full server under mixed concurrent load checked request-for-request
against the serial (batcher-less) dispatch."""
import random
import threading
import time

import numpy as np

from tests.conftest import make_sphere


def test_microbatcher_fuzz_identity():
    """Many threads, several signatures, jittered arrivals, chunked drains:
    every submission must get exactly ITS result (runner = per-payload
    transform), regardless of which leader ran it or how batches formed."""
    from dipole_tpu.serve.batching import MicroBatcher

    rng = random.Random(7)
    b = MicroBatcher(window_s=0.005, max_batch=3)
    n_threads, n_rounds = 16, 12
    results: dict = {}
    errors: list = []

    def runner(payloads):
        # simulate device latency so drains overlap with fresh arrivals
        time.sleep(0.002)
        return [p * 1000 + 1 for p in payloads]

    def worker(tid):
        r = random.Random(tid)
        try:
            for i in range(n_rounds):
                time.sleep(r.random() * 0.004)
                sig = ("s", r.randrange(3))
                payload = tid * 1000 + i
                out = b.submit(sig, payload, runner)
                assert out == payload * 1000 + 1, (tid, i, out)
            results[tid] = True
        except Exception as e:  # noqa: BLE001
            errors.append((tid, e))

    threads = [threading.Thread(target=worker, args=(t,))
               for t in range(n_threads)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60.0)
    assert not errors, errors[:3]
    assert len(results) == n_threads
    assert b.jobs_run == n_threads * n_rounds
    del rng


def test_microbatcher_runner_exception_reaches_all_waiters():
    """A runner that fails for one batch must raise in every thread of that
    batch — and MUST NOT poison later batches on the same signature."""
    from dipole_tpu.serve.batching import MicroBatcher

    b = MicroBatcher(window_s=0.05, max_batch=8)
    outcomes: dict = {}

    def runner(payloads):
        if any(p < 0 for p in payloads):
            raise ValueError("poisoned batch")
        return [p + 1 for p in payloads]

    def worker(i, payload):
        try:
            outcomes[i] = ("ok", b.submit("sig", payload, runner))
        except ValueError as e:
            outcomes[i] = ("err", str(e))

    threads = [threading.Thread(target=worker, args=(i, -1 if i < 4 else i))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(30.0)
    assert all(outcomes[i] == ("err", "poisoned batch") for i in range(4))
    # signature must be clean afterwards
    assert b.submit("sig", 10, runner) == 11


def test_server_soak_mixed_concurrent_load(tmp_path):
    """Live-TCP soak: concurrent clients with MIXED functions and sizes,
    every response checked against the serial batcher-less dispatch on the
    same input. Covers cross-signature leader interactions, the chunker,
    and the admission-control path in one go."""
    import socket

    from dipole_tpu.serve import protocol
    from dipole_tpu.serve.handlers import dispatch
    from dipole_tpu.serve.server_para import Server

    sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    server = Server(host="127.0.0.1", port=port, log_dir=str(tmp_path),
                    microbatch=True, microbatch_window_s=0.02)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    time.sleep(0.5)

    jobs = []
    for i, (fn, n, cfg) in enumerate([
        ("simple_estimate", 140, {"diffuse": True}),
        ("simple_estimate", 140, {"diffuse": True}),
        ("simple_estimate", 200, {"diffuse": False}),
        ("tree_xie_propagation", 150,
         {"max_nn": 10, "eps": 1e-5, "diffuse": False, "times": 3}),
        ("tree_xie_propagation", 150,
         {"max_nn": 10, "eps": 1e-5, "diffuse": False, "times": 3}),
        ("tree_xie_propagation", 180,
         {"max_nn": 10, "eps": 1e-5, "diffuse": True, "times": 3}),
    ] * 2):
        xyz = make_sphere(n, seed=100 + i)[:, :3].astype(np.float64) * 0.05
        jobs.append((fn, xyz, cfg))

    # serial ground truth through the same handlers, no batcher
    want = [dispatch(fn, xyz, dict(cfg)) for fn, xyz, cfg in jobs]

    got: dict = {}
    errors: list = []

    def client(i):
        fn, xyz, cfg = jobs[i]
        try:
            got[i] = protocol.request("127.0.0.1", port, fn, xyz, dict(cfg))
        except Exception as e:  # noqa: BLE001
            errors.append((i, e))

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(len(jobs))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120.0)
    server.stop()
    assert not errors, errors[:3]
    for i in range(len(jobs)):
        np.testing.assert_allclose(got[i], want[i], rtol=1e-4, atol=1e-5,
                                   err_msg=f"job {i} ({jobs[i][0]})")
