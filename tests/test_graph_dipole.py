"""Patch-graph pipeline tests (grid + ncut partitioning, global flip)."""
import numpy as np
import pytest

from dipole_tpu.ops.metrics import sign_agreement
from dipole_tpu.pipelines import graph_dipole as gd
from tests.conftest import make_sphere, scramble_signs


def test_bitree_cluster_partitions():
    pc = make_sphere(600, seed=0)
    labels = gd.bitree_cluster(pc[:, :3], k_neighbors=10, minimum_rate=0.2)
    assert labels.shape == (600,)
    counts = np.bincount(labels)
    assert len(counts) >= 4
    assert counts.min() > 0


def test_graph_dipole_core_orients_sphere_grid():
    gt = make_sphere(800, seed=1)
    scrambled, _ = scramble_signs(gt, seed=2)
    out, G, patches, flip = gd.graph_dipole_core(
        scrambled.copy(), divide_method="grid_partition", n_part=4, min_patch=0
    )
    assert sum(len(p) for p in patches) == 800
    assert sign_agreement(out, gt) >= 0.97


def test_graph_dipole_core_orients_sphere_ncut():
    gt = make_sphere(700, seed=3)
    scrambled, _ = scramble_signs(gt, seed=4)
    out, G, patches, flip = gd.graph_dipole_core(
        scrambled.copy(), divide_method="ncut_partition",
        k_neighbors=10, mininum_rate=0.15,
    )
    assert sign_agreement(out, gt) >= 0.95


def test_run_folder_csv(tmp_path):
    from dipole_tpu.utils.io import write_ply

    gt = make_sphere(250, seed=5) * 0.02  # inside estimator radius
    write_ply(tmp_path / "a.ply", gt[:, :3], gt[:, 3:])

    def handler(path):
        return f"{path},1.0", "filename,score"

    log = gd.run_folder(tmp_path, "exp1", handler=handler, log_dir=tmp_path)
    lines = log.read_text().strip().split("\n")
    assert lines[0] == "filename,score"
    assert len(lines) == 2


def test_single_propagate_file_metrics(tmp_path):
    from dipole_tpu.utils.io import write_ply

    gt = make_sphere(300, seed=6)
    scrambled, _ = scramble_signs(gt, seed=7)
    write_ply(tmp_path / "seg.ply", scrambled[:, :3], scrambled[:, 3:])
    m = gd.single_propagate_file(
        tmp_path / "seg.ply", use_origin_normal=True,
        propagation_method=gd.st_propagation_points_file,
    )
    # metric compares against the (scrambled) file normals symmetrically;
    # just check the harness produces the metric dict
    assert set(m.keys()) == {"loss", "count_90", "total_count"}
    assert m["total_count"] == 300
