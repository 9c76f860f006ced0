"""Concurrent-serving benchmark for the reference-protocol TCP server.

Starts the threaded server (serve.server_para.Server) in-process with
--warmup semantics, then fires waves of concurrent simple_estimate /
tree_xie_propagation requests (10k points each, the fork's production
workload class) and reports per-request latency + aggregate throughput.

Usage: python tools/serve_bench.py [n_clients] [n_points] [rounds]
"""
import socket
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dipole_tpu.serve import protocol  # noqa: E402
from dipole_tpu.serve.server_para import Server  # noqa: E402


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


def main(n_clients=4, n_points=10000, rounds=3):
    port = free_port()
    server = Server(host="127.0.0.1", port=port, log_dir="/tmp/serve_bench_logs")
    threading.Thread(target=server.serve_forever, daemon=True).start()
    time.sleep(0.5)

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

        t0 = time.perf_counter()
        for r in range(rounds):
            threads = [threading.Thread(target=worker, args=(r * n_clients + i,))
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
        print(f"{fn}: {n_clients} concurrent x {rounds} rounds of "
              f"{n_points}-pt requests: "
              f"latency p50 {np.median(lat):.2f}s p95 "
              f"{np.percentile(lat, 95):.2f}s, "
              f"throughput {n_req / wall:.2f} req/s "
              f"({n_req * n_points / wall / 1e3:.0f} kpts/s)")
    server.stop()


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:4]]
    main(*args)
