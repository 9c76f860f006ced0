"""Per-stage host/device breakdown of one tree_xie_propagation request —
the measurement behind VERDICT r3 item 5's throughput target (>= 10 req/s
streaming on this 1-core host, or proof the floor is wire/syscall).

Times every stage of the serving path in isolation (min of reps, warm):
wire decode/encode (loopback socket + struct), normal estimation split into
native kNN and device PCA, Transform, EMST edge build (native CSR), BFS
order extraction (native), the lock-step replay device call, vote
alignment, and the sign fix. Prints a table with each stage classified
host-python / host-native / device / wire.

Usage: python tools/serve_host_breakdown.py [n_points]
"""
import socket
import sys
import threading
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timed(fn, reps=5):
    fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main(n=10000):
    from dipole_tpu.ops import fields, propagate
    from dipole_tpu.ops.estimate import estimate_normals
    from dipole_tpu.utils.io import Transform, gen_grid
    from dipole_tpu import graphs, native

    rng = np.random.default_rng(0)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    xyz = (v * 0.05 + rng.normal(scale=0.002, size=(n, 3))).astype(np.float64)

    rows = []

    def stage(label, kind, fn, reps=5):
        dt = timed(fn, reps)
        rows.append((label, kind, dt))
        print(f"  {label:36s} {kind:12s} {dt*1e3:8.1f} ms", flush=True)

    # --- wire: loopback socket round trip of the request payload sizes ---
    payload = xyz.tobytes()                      # 24 B/point in
    reply = np.ones((n, 6), np.float64).tobytes()  # 48 B/point out

    srv = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    port = srv.getsockname()[1]
    done = threading.Event()

    def echo():
        conn, _ = srv.accept()
        while not done.is_set():
            buf = b""
            while len(buf) < len(payload):
                d = conn.recv(1 << 20)
                if not d:
                    return
                buf += d
            conn.sendall(reply)

    threading.Thread(target=echo, daemon=True).start()
    cli = socket.create_connection(("127.0.0.1", port))

    def wire_round():
        cli.sendall(payload)
        got = b""
        while len(got) < len(reply):
            got += cli.recv(1 << 20)

    print(f"tree_xie host/device breakdown, n={n}:")
    stage("wire in+out (loopback round trip)", "wire", wire_round)
    done.set()

    # --- pipeline stages ---
    pc_holder = {}

    def est():
        pc_holder["pc"] = estimate_normals(
            np.asarray(xyz, np.float32), max_nn=30)

    stage("estimate_normals (kNN+PCA)", "mixed", est)
    pc = pc_holder["pc"]
    idx, d2 = native.knn(pc[:, :3], pc[:, :3], 30)
    stage("  - native kNN alone", "host-native",
          lambda: native.knn(pc[:, :3], pc[:, :3], 30))
    stage("Transform.trans", "host-python", lambda: Transform.trans(pc))
    tpc, _ = Transform.trans(pc)

    g_holder = {}

    def emst():
        g_holder["g"] = graphs.emst_from_pc(tpc[:, :3], k=10, threshold=1.0)[0]

    stage("EMST build (native kNN -> CSR)", "host-native", emst)
    G = g_holder["g"]
    starts = [0, n // 3, 2 * n // 3]
    stage("BFS orders x3 (native CSR)", "host-native",
          lambda: [G.get_bfs_route(s) for s in starts])
    orders = np.stack([G.get_bfs_route(s) for s in starts])

    stage("replay device call (T=3)", "device",
          lambda: propagate.xie_propagation_in_order(
              tpc, orders, diffuse=True), reps=3)
    flips = propagate.xie_propagation_in_order(tpc, orders, diffuse=True)

    stage("vote alignment (2^T enum)", "host-python",
          lambda: propagate.align_and_vote(tpc, flips.T))
    stage("sign fix (lattice potential)", "device",
          lambda: fields.measure_mean_potential(tpc), reps=3)
    stage("float64 encode (reply array)", "host-python",
          lambda: tpc.astype(np.float64).tobytes())

    total = sum(r[2] for r in rows)
    host_py = sum(r[2] for r in rows if r[1] == "host-python")
    host_nat = sum(r[2] for r in rows if r[1] == "host-native")
    wire = sum(r[2] for r in rows if r[1] == "wire")
    dev = sum(r[2] for r in rows if r[1] == "device")
    print(f"\n  total {total*1e3:.1f} ms  =  wire {wire*1e3:.1f}  "
          f"host-python {host_py*1e3:.1f}  host-native {host_nat*1e3:.1f}  "
          f"device {dev*1e3:.1f}  (+mixed)")
    print(f"  serial-request ceiling: {1/total:.1f} req/s; "
          f"host-only floor: {1/max(total-dev, 1e-9):.1f} req/s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10000)
