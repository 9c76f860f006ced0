"""Server-side algorithm handlers, dispatched by function_name.

Parity with the reference's handler set (socket_server.py:18-60,
socket_server_para.py:70-135): simple_estimate, hoppe_estimate,
graph_dipole_estimate, xie_propagation, tree_xie_propagation. Degenerate
inputs (< max_nn points) short-circuit with dummy normals like the
reference's warning path (socket_server_para.py:70-75)."""
from __future__ import annotations

import numpy as np

from dipole_tpu import graphs
from dipole_tpu.ops import fields, propagate
from dipole_tpu.ops.estimate import estimate_normals
from dipole_tpu.utils.io import Transform

__all__ = ["HANDLERS", "dispatch", "set_mesh", "get_mesh"]

# Server-wide mesh (None = single device). Configured once at server start
# via --mesh / DIPOLE_TPU_MESH; every request's device work shards over it.
_MESH = None


def set_mesh(mesh) -> None:
    from dipole_tpu.api import resolve_mesh

    global _MESH
    _MESH = resolve_mesh(mesh)


def get_mesh():
    return _MESH


def _prep(xyz_data: np.ndarray, max_nn: int):
    pc = np.asarray(xyz_data, dtype=np.float32)
    pc = estimate_normals(pc, max_nn=max_nn)
    return Transform.trans(pc)


def _finish(pc: np.ndarray, transform: Transform) -> np.ndarray:
    from dipole_tpu.api import stage_mesh

    m = stage_mesh(_MESH, "sign_fix")
    if m is not None:
        from dipole_tpu.parallel.sharding import potential_sharded
        from dipole_tpu.utils.io import gen_grid

        mean = float(potential_sharded(pc, gen_grid(10), m).mean())
    else:
        mean = fields.measure_mean_potential(pc)
    if mean < 0:
        pc[:, 3:6] *= -1
    return transform.inverse(pc).astype(np.float64)


def simple_estimate(xyz_data, config):
    from dipole_tpu.api import stage_mesh

    pc, transform = _prep(xyz_data, max_nn=30)
    m = stage_mesh(_MESH, "greedy", len(pc))
    if m is not None:
        from dipole_tpu.parallel.sharding import orient_points_multichip

        # propagation + sign fix in one sharded pass (identical decisions)
        pc = orient_points_multichip(pc, m,
                                     diffuse=config.get("diffuse", True),
                                     starting_point=0)
        return transform.inverse(pc).astype(np.float64)
    pc = propagate.strongest_field_propagation_points(
        pc, diffuse=config.get("diffuse", True), starting_point=0
    )
    return _finish(pc, transform)


def xie_propagation(xyz_data, config):
    pc, transform = _prep(xyz_data, max_nn=config["max_nn"])
    pc = propagate.xie_propagation_points(
        pc, eps=config["eps"], diffuse=config["diffuse"], starting_point=0
    )
    return _finish(pc, transform)


def tree_xie_propagation(xyz_data, config):
    from dipole_tpu.api import stage_mesh

    pc, transform = _prep(xyz_data, max_nn=config["max_nn"])
    pc, _ = propagate.xie_propagation_bfs_tree(
        pc, eps=config["eps"], diffuse=config["diffuse"],
        times=config["times"], starting_point=0,
        knn_mask=config.get("knn_mask", -1), C=config.get("C", 3),
        mesh=stage_mesh(_MESH, "replay", len(pc)),
    )
    return _finish(pc, transform)


def hoppe_estimate(xyz_data, config):
    pc = np.asarray(xyz_data, dtype=np.float32)
    pc = estimate_normals(
        pc, max_nn=config.get("k_neighbor", 10), radius=config.get("r", 0.1)
    )
    pc = graphs.orient_normals_hoppe(pc, k=config.get("k_neighbor", 10))
    return pc.astype(np.float64)


def graph_dipole_estimate(xyz_data, config):
    from dipole_tpu.pipelines.graph_dipole import graph_dipole_server_api

    return graph_dipole_server_api(xyz_data, config).astype(np.float64)


HANDLERS = {
    "simple_estimate": simple_estimate,
    "hoppe_estimate": hoppe_estimate,
    "graph_dipole_estimate": graph_dipole_estimate,
    "xie_propagation": xie_propagation,
    "tree_xie_propagation": tree_xie_propagation,
}


def dispatch(function_name: str, xyz_data: np.ndarray, config: dict,
             log=None, batcher=None) -> np.ndarray:
    if function_name not in HANDLERS:
        raise ValueError(f"Unknown method: {function_name}")
    max_nn = config.get("max_nn", 30)
    if function_name != "hoppe_estimate" and len(xyz_data) < max_nn:
        if log is not None:
            log(
                f"cloud too small for normal estimation ({len(xyz_data)} "
                f"points < max_nn={max_nn}); returning placeholder normals",
                mode="warning",
            )
        out = np.ones((len(xyz_data), 6))
        out[:, :3] = xyz_data
        return out
    from dipole_tpu.api import stage_mesh

    if batcher is not None and function_name == "simple_estimate" \
            and stage_mesh(_MESH, "greedy", len(xyz_data)) is None:
        from dipole_tpu.serve.batching import batched_simple_estimate

        return batched_simple_estimate(batcher, xyz_data, config)
    if batcher is not None and function_name == "tree_xie_propagation" \
            and stage_mesh(_MESH, "replay", len(xyz_data)) is None \
            and config.get("knn_mask", -1) <= 0:
        from dipole_tpu.serve.batching import batched_tree_xie

        return batched_tree_xie(batcher, xyz_data, config)
    return HANDLERS[function_name](xyz_data, config)
