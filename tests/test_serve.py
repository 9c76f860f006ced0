"""Server tests: real TCP round-trips against a live server thread."""
import socket
import threading
import time

import numpy as np
import pytest

from dipole_tpu.serve import protocol
from dipole_tpu.serve.server_para import AdmissionControl, Server
from tests.conftest import make_sphere


@pytest.fixture(scope="module")
def live_server(tmp_path_factory):
    log_dir = tmp_path_factory.mktemp("server_logs")
    server = Server(host="127.0.0.1", port=0, log_dir=str(log_dir))
    # bind to an ephemeral port manually for the test
    sock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    server.port = port
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    time.sleep(0.5)
    yield "127.0.0.1", port, server
    server.stop()


def test_simple_estimate_roundtrip(live_server):
    host, port, _ = live_server
    # scaled inside the 0.1 hybrid-search radius (the estimator's fixed
    # radius is in raw input units, as in the reference)
    xyz = make_sphere(120, seed=0)[:, :3].astype(np.float64) * 0.05
    out = protocol.request(host, port, "simple_estimate", xyz,
                           {"diffuse": True})
    assert out.shape == (120, 6)
    np.testing.assert_allclose(out[:, :3], xyz, atol=1e-6)
    norms = np.linalg.norm(out[:, 3:], axis=1)
    assert (norms > 0.5).all()
    # orientation consistency: outward agreement (sphere)
    v = xyz / np.linalg.norm(xyz, axis=1, keepdims=True)
    agree = ((out[:, 3:] * v).sum(1) > 0).mean()
    assert max(agree, 1 - agree) > 0.95


def test_degenerate_input_returns_dummy_normals(live_server):
    host, port, _ = live_server
    xyz = np.random.default_rng(0).normal(size=(5, 3))
    out = protocol.request(host, port, "tree_xie_propagation", xyz,
                           {"max_nn": 10, "eps": 0.01, "diffuse": True,
                            "times": 3, "knn_mask": -1, "C": 3})
    assert out.shape == (5, 6)
    np.testing.assert_allclose(out[:, 3:], 1.0)  # dummy normals path


def test_unknown_function_errors(live_server):
    host, port, _ = live_server
    xyz = np.zeros((4, 3))
    with pytest.raises(RuntimeError):
        protocol.request(host, port, "no_such_method", xyz, {})


def test_fragmented_header_is_reassembled(live_server):
    """TCP may split the JSON header across packets; the server must loop
    until it parses instead of trusting one recv()."""
    import json

    host, port, _ = live_server
    xyz = np.random.default_rng(1).normal(size=(5, 3)) * 0.05
    header = json.dumps({
        "data_size": len(xyz),
        "function_name": "tree_xie_propagation",
        "function_config": {"max_nn": 10, "eps": 0.01, "diffuse": True,
                            "times": 3, "knn_mask": -1, "C": 3},
    }).encode()
    with socket.create_connection((host, port), timeout=60) as s:
        s.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        mid = len(header) // 2
        s.sendall(header[:mid])
        time.sleep(0.3)                      # force a separate segment
        s.sendall(header[mid:])
        ok = json.loads(s.recv(protocol.REQUEST_BUFFER_SIZE))
        assert ok["status"] == "OK"
        s.sendall(np.ascontiguousarray(xyz, np.float64).tobytes())
        out = protocol.recv_exact(s, len(xyz) * 48)
    assert len(out) == len(xyz) * 48


def test_hoppe_estimate_roundtrip(live_server):
    host, port, _ = live_server
    xyz = make_sphere(150, seed=1)[:, :3].astype(np.float64)
    out = protocol.request(host, port, "hoppe_estimate", xyz,
                           {"k_neighbor": 10, "r": 1.0})
    assert out.shape == (150, 6)
    v = xyz / np.linalg.norm(xyz, axis=1, keepdims=True)
    agree = ((out[:, 3:] * v).sum(1) > 0).mean()
    assert max(agree, 1 - agree) > 0.95


def test_admission_control_rejects_oversized(tmp_path):
    ac = AdmissionControl(max_pts=100, log_dir=str(tmp_path))
    with pytest.raises(ValueError):
        ac.acquire(11)  # 121 > 100
    ac.acquire(10)
    ac.release(10)
    assert ac.res_pts == 100


def test_admission_control_queues():
    ac = AdmissionControl(max_pts=100, poll_s=0.05)
    ac.acquire(10)
    done = []

    def second():
        ac.acquire(10)
        done.append(True)

    t = threading.Thread(target=second)
    t.start()
    time.sleep(0.15)
    assert not done  # still queued
    ac.release(10)
    t.join(timeout=2)
    assert done


def test_http_probe_fails_fast_and_server_stays_live(live_server):
    """Bytes that cannot be a JSON header (e.g. an HTTP scanner) must get an
    immediate ERROR instead of wedging the accept loop on a blocking recv."""
    import json

    host, port, _ = live_server
    with socket.create_connection((host, port), timeout=10) as s:
        s.sendall(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
        t0 = time.time()
        reply = s.recv(protocol.REQUEST_BUFFER_SIZE)
        assert time.time() - t0 < 5.0
        assert json.loads(reply)["status"] == "ERROR"
    # a well-formed request right after must still be served
    xyz = make_sphere(60, seed=3)[:, :3].astype(np.float64)
    out = protocol.request(host, port, "simple_estimate", xyz, {"diffuse": False})
    assert out.shape == (60, 6)


def test_microbatcher_coalesces_and_propagates_errors():
    import threading

    from dipole_tpu.serve.batching import MicroBatcher

    b = MicroBatcher(window_s=0.05, max_batch=8)
    calls = []

    def runner(payloads):
        calls.append(list(payloads))
        return [p * 2 for p in payloads]

    results = {}

    def worker(i):
        results[i] = b.submit("sig", i, runner)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(calls) == 1 and sorted(calls[0]) == [0, 1, 2, 3]
    assert results == {0: 0, 1: 2, 2: 4, 3: 6}
    assert b.batches_run == 1 and b.jobs_run == 4

    def bad_runner(payloads):
        raise RuntimeError("boom")

    errors = []

    def bad_worker(i):
        try:
            b.submit("sig2", i, bad_runner)
        except RuntimeError as e:
            errors.append(str(e))

    threads = [threading.Thread(target=bad_worker, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == ["boom"] * 3


def test_greedy_batched_matches_single():
    """Batched greedy (the micro-batch core) = per-cloud on-the-fly scan."""
    import os

    from dipole_tpu.ops import propagate
    from tests.conftest import make_sphere, scramble_signs

    clouds = [scramble_signs(make_sphere(n, seed=n), seed=n + 1)[0]
              for n in (150, 200, 170)]
    got = propagate.greedy_sign_sequence_batched(clouds)
    assert len(got) == 3
    os.environ["DIPOLE_TPU_NO_PALLAS"] = "1"
    try:
        for pc, (acc, sign) in zip(clouds, got):
            # force the same on-the-fly kernel for the reference run
            acc_s, sign_s = propagate.greedy_sign_sequence(pc, matrix_limit=0)
            assert (np.asarray(sign_s) == sign).all()
            np.testing.assert_allclose(acc, np.asarray(acc_s), rtol=1e-4,
                                       atol=1e-5)
    finally:
        os.environ.pop("DIPOLE_TPU_NO_PALLAS")


def test_mean_potential_batched_matches_single():
    from dipole_tpu.ops import fields
    from tests.conftest import make_sphere

    clouds = [make_sphere(n, seed=n) * 0.5 for n in (80, 120)]
    got = fields.measure_mean_potential_batched(clouds)
    want = [fields.measure_mean_potential(pc) for pc in clouds]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_server_microbatch_concurrent_requests(live_server):
    """Concurrent simple_estimate requests through the live threaded server
    with micro-batching: every client gets the same answer the serial
    handler produces."""
    import threading

    from dipole_tpu.serve import handlers

    host, port, server = live_server
    assert server.batcher is not None
    rng = np.random.default_rng(50)
    xyz = (make_sphere(120, seed=51)[:, :3] +
           rng.normal(scale=0.003, size=(120, 3))).astype(np.float64)
    want = handlers.dispatch("simple_estimate", xyz, {"diffuse": True})

    outs = {}

    def client(i):
        outs[i] = protocol.request(host, port, "simple_estimate", xyz,
                                   {"diffuse": True})

    threads = [threading.Thread(target=client, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, out in outs.items():
        agree = ((out[:, 3:] * want[:, 3:]).sum(1) > 0).mean()
        assert agree == 1.0, (i, agree)


def test_tree_xie_microbatch_matches_serial():
    """Micro-batched tree_xie (vmapped lock-step replay over several clouds)
    = the serial handler, per request, including different sizes sharing one
    dispatch."""
    import threading

    from dipole_tpu.serve import handlers
    from dipole_tpu.serve.batching import MicroBatcher

    cfg = {"max_nn": 10, "eps": 1e-5, "diffuse": False, "times": 3}
    clouds = [make_sphere(n, seed=n)[:, :3].astype(np.float64)
              for n in (90, 90, 130)]
    want = [handlers.dispatch("tree_xie_propagation", xyz, dict(cfg))
            for xyz in clouds]

    b = MicroBatcher(window_s=0.25, max_batch=8)
    outs = {}

    def client(i):
        outs[i] = handlers.dispatch("tree_xie_propagation", clouds[i],
                                    dict(cfg), batcher=b)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    # 3 replay jobs + 3 mean-potential sign-fix jobs, all through the batcher
    assert b.jobs_run == 6
    for i in range(3):
        np.testing.assert_allclose(outs[i], want[i], rtol=1e-4, atol=1e-5)


def test_microbatcher_stolen_leader_waits():
    """A draining leader from a PREVIOUS batch may pop a new leader's job
    while the new leader is still in its batching window; the new leader
    must then wait for the thief's runner instead of returning its job's
    (unset) result. Reproduces the serve-bench None results."""
    import threading
    import time

    from dipole_tpu.serve.batching import MicroBatcher

    b = MicroBatcher(window_s=0.0, max_batch=1)
    gate1, gate2 = threading.Event(), threading.Event()
    calls = []

    def runner(payloads):
        calls.append(list(payloads))
        (gate1 if len(calls) == 1 else gate2).wait(5.0)
        return [p * 10 for p in payloads]

    results = {}

    def submit_a():
        results["a"] = b.submit("s", 1, runner)

    def submit_b():
        # window long enough that A (released from gate1) steals this job
        bb = b
        bb.window_s = 0.4
        results["b"] = bb.submit("s", 2, runner)

    ta = threading.Thread(target=submit_a)
    ta.start()
    time.sleep(0.1)            # A is the leader, blocked in runner on gate1
    tb = threading.Thread(target=submit_b)
    tb.start()
    time.sleep(0.1)            # B appended to a fresh queue, sleeping
    gate1.set()                # A finishes chunk [1], loops, pops B's job
    time.sleep(0.1)
    gate2.set()                # A's second runner call (B's job) completes
    ta.join(5.0)
    tb.join(5.0)
    assert results["a"] == 10
    assert results["b"] == 20  # pre-fix: None
    assert calls == [[1], [2]]


def test_microbatcher_drains_beyond_max_batch():
    """Jobs beyond max_batch must not be stranded: the leader drains the
    whole queue in chunks, so 2*max_batch+1 concurrent submits all finish."""
    import threading

    from dipole_tpu.serve.batching import MicroBatcher

    b = MicroBatcher(window_s=0.1, max_batch=4)
    results = {}

    def worker(i):
        results[i] = b.submit("sig", i, lambda ps: [p * 10 for p in ps])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(11)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not any(t.is_alive() for t in threads), "stranded follower"
    assert results == {i: i * 10 for i in range(11)}
    assert b.jobs_run == 11
