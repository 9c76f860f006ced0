"""Concurrent-serving benchmark for the reference-protocol TCP server.

Starts the threaded server (serve.server_para.Server) in-process with
--warmup semantics, then fires waves of concurrent simple_estimate /
tree_xie_propagation requests (10k points each, the fork's production
workload class) and reports per-request latency + aggregate throughput.

Usage: python tools/serve_bench.py [n_clients] [n_points] [rounds] [--stream]
"""
import socket
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dipole_tpu.serve import protocol  # noqa: E402
from dipole_tpu.serve.server_para import Server, warmup  # noqa: E402


def free_port() -> int:
    s = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def cloud(n, seed):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (v * 0.05 + rng.normal(scale=0.002, size=(n, 3))).astype(np.float64)


def main(n_clients=4, n_points=10000, rounds=3, stream=False):
    port = free_port()
    server = Server(host="127.0.0.1", port=port, log_dir="/tmp/serve_bench_logs")
    threading.Thread(target=server.serve_forever, daemon=True).start()
    time.sleep(0.5)
    # production startup path: precompile serial + micro-batched programs
    warmup([n_points], log_dir="/tmp/serve_bench_logs")

    for fn, cfg in [
        ("simple_estimate", {"diffuse": True}),
        ("tree_xie_propagation", {"max_nn": 30, "eps": 0.01, "diffuse": True,
                                  "times": 3, "knn_mask": -1, "C": 3}),
    ]:
        # warm the compiled programs with one request
        protocol.request("127.0.0.1", port, fn, cloud(n_points, 0), cfg)

        lat: list = []
        errors: list = []
        lock = threading.Lock()

        def worker(seed):
            try:
                xyz = cloud(n_points, seed)
                t0 = time.perf_counter()
                out = protocol.request("127.0.0.1", port, fn, xyz, cfg)
                dt = time.perf_counter() - t0
                assert out.shape == (n_points, 6)
            except Exception as e:
                with lock:
                    errors.append(e)
                return
            with lock:
                lat.append(dt)

        def stream_worker(cid):
            # each client sends `rounds` requests back-to-back (production
            # open-loop pattern: host stages of one request overlap device
            # work of others; no cross-client barrier)
            for r in range(rounds):
                worker(r * n_clients + cid)

        t0 = time.perf_counter()
        if stream:
            threads = [threading.Thread(target=stream_worker, args=(i,))
                       for i in range(n_clients)]
            for t in threads:
                t.start()
            for t in threads:
                t.join()
        else:
            for r in range(rounds):
                threads = [
                    threading.Thread(target=worker, args=(r * n_clients + i,))
                    for i in range(n_clients)]
                for t in threads:
                    t.start()
                for t in threads:
                    t.join()
        wall = time.perf_counter() - t0
        if errors:
            raise RuntimeError(
                f"{fn}: {len(errors)}/{rounds * n_clients} requests failed; "
                f"first: {errors[0]!r}")
        n_req = rounds * n_clients
        mode = "streaming" if stream else "rounds"
        print(f"{fn} [{mode}]: {n_clients} concurrent x {rounds} x "
              f"{n_points}-pt requests: "
              f"latency p50 {np.median(lat):.2f}s p95 "
              f"{np.percentile(lat, 95):.2f}s, "
              f"throughput {n_req / wall:.2f} req/s "
              f"({n_req * n_points / wall / 1e3:.0f} kpts/s)")
    server.stop()


if __name__ == "__main__":
    stream = "--stream" in sys.argv[1:]
    args = [int(a) for a in sys.argv[1:] if not a.startswith("--")][:3]
    main(*args, stream=stream)
