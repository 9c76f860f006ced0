"""Single-threaded TCP orientation server (reference socket_server.py).

Speaks the exact reference protocol (see serve/protocol.py); handles
simple_estimate and hoppe_estimate like the reference's single-thread server
(socket_server.py:62-114), plus the full handler set for convenience.
Runs test_api (a smoke run of simple_estimate on data/ok.xyz,
socket_server.py:29-36) before serving when --self_test is given.
"""
from __future__ import annotations

import argparse
import os
import socket

import numpy as np

from dipole_tpu.serve import protocol
from dipole_tpu.serve.handlers import dispatch

HOST = "0.0.0.0"
PORT = 12345


def test_api(data_path="/root/reference/data/ok.xyz"):
    xyz = np.loadtxt(data_path)[:, :3]
    result = dispatch("simple_estimate", xyz, {"diffuse": True})
    print(result)
    return result


def serve(host=HOST, port=PORT):
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind((host, port))
        s.listen()
        print(f"Server listening on {host}:{port}")
        while True:
            conn, addr = s.accept()
            with conn:
                print(f"client connected: {addr}")
                try:
                    req, xyz = protocol.read_request(conn)
                    print(req)
                    result = dispatch(req["function_name"], xyz,
                                      req.get("function_config", {}))
                    protocol.send_result(conn, result)
                except Exception as e:  # noqa: BLE001 — server must not die
                    print(f"Error: {e}")
                    protocol.send_error(conn)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=PORT)
    parser.add_argument("--host", type=str, default=HOST)
    parser.add_argument("--self_test", action="store_true")
    parser.add_argument("--mesh", type=str,
                        default=os.environ.get("DIPOLE_TPU_MESH"),
                        help="multi-chip: device count or 'auto'")
    args = parser.parse_args(argv)
    if args.mesh:
        from dipole_tpu.serve import handlers as _handlers

        _handlers.set_mesh(args.mesh)
    if args.self_test:
        test_api()
    serve(args.host, args.port)


if __name__ == "__main__":
    main()
