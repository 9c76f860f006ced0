"""Visualization export + analysis module tests."""
import json

import pytest

import numpy as np

from dipole_tpu import analysis, vis
from dipole_tpu.ops import fields
from dipole_tpu.utils.io import read_ply, write_ply
from tests.conftest import make_sphere


def test_draw_pc_with_labels(tmp_path):
    pc = make_sphere(100, seed=0)
    labels = np.arange(100) % 4
    vis.draw_pc(pc, tmp_path / "a.ply", labels=labels)
    v = read_ply(tmp_path / "a.ply")
    assert len(v["x"]) == 100 and "red" in v and "nx" in v


def test_draw_field(tmp_path):
    src = make_sphere(50, seed=1)
    tgt = make_sphere(30, seed=2) * 1.5
    vis.draw_field(src, tgt, fields.field_grad, tmp_path / "f.ply")
    v = read_ply(tmp_path / "f.ply")
    assert len(v["x"]) == 80
    # target rows carry the field as normals; source rows keep their normals
    g = np.stack([v["green"], v["red"]], 1)
    assert (v["green"][:30] > 0).all() and (v["red"][30:] > 0).all()


def test_draw_topology(tmp_path):
    from dipole_tpu import graphs

    pc = make_sphere(80, seed=3)
    patches = [np.arange(0, 40), np.arange(40, 80)]
    G = graphs.BidGraph()
    G.V = [0, 1]
    G.E = [graphs.BiEdge(0, 1, 1.0, -1.0)]
    verts, faces, colors = vis.draw_topology(G, pc, patches,
                                             path=tmp_path / "t.ply")
    assert len(verts) > 0 and len(faces) > 0
    assert (tmp_path / "t.ply").exists()


def test_field_cross_section(tmp_path):
    pc = make_sphere(100, seed=4) * 0.4
    vals = vis.field_cross_section(pc, tmp_path / "cs.ply", n=16)
    assert vals.shape == (16, 16)
    assert np.isfinite(vals).all()


def test_analysis_get_segs(tmp_path):
    pc = make_sphere(60, seed=5)
    write_ply(tmp_path / "res0.ply", pc[:, :3], pc[:, 3:])
    write_ply(tmp_path / "res1.ply", pc[:, :3], pc[:, 3:])
    (tmp_path / "reslog.json").write_text(json.dumps({
        "node_log": [{"id": 0, "metric": 0.9}, {"id": 1, "metric": 0.8}]
    }))
    segs = analysis.get_segs(tmp_path)
    assert len(segs) == 2
    assert segs[0].metric == 0.9
    table = analysis.self_interaction_table(segs)
    assert len(table) == 2
    assert np.isfinite(table[0]["self_interaction_all"])


def test_isosurface_sphere_analytic():
    """Marching-tetrahedra correctness: the 0.25-level set of x^2+y^2+z^2
    must be the radius-0.5 sphere, to within one lattice cell."""
    from dipole_tpu.vis import isosurface

    lin = np.linspace(-1, 1, 33)
    X, Y, Z = np.meshgrid(lin, lin, lin, indexing="ij")
    F = X**2 + Y**2 + Z**2
    verts, faces = isosurface(F, (lin, lin, lin), 0.25)
    assert len(verts) > 500
    assert faces.shape == (len(verts) // 3, 3)
    r = np.linalg.norm(verts, axis=1)
    spacing = lin[1] - lin[0]
    assert np.abs(r - 0.5).max() < spacing
    # surface area of the triangle soup ~ 4*pi*0.25
    tri = verts.reshape(-1, 3, 3)
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1).sum()
    assert abs(area - 4 * np.pi * 0.25) < 0.15


def test_draw_field_isosurface_writes_ply(tmp_path):
    from dipole_tpu.vis import draw_field_isosurface
    from tests.conftest import make_sphere

    pc = make_sphere(300, seed=3) * 0.5
    path = tmp_path / "iso.ply"
    verts, faces, colors = draw_field_isosurface(pc, path, res=24, levels=6)
    assert path.exists() and path.stat().st_size > 200
    assert len(verts) > 0 and len(colors) == len(verts)
    head = path.read_bytes()[:200]
    assert b"ply" in head and b"element vertex" in head


def test_plot_cross_section_png(tmp_path):
    """plot_cross_section writes a non-empty PNG for the analytic sphere
    (figure-grade analog of reference vis_field.plot_F, VERDICT r2 item 8)."""
    pytest.importorskip("matplotlib")
    pc = make_sphere(80, seed=7)
    for quantity in ("potential", "field"):
        out = tmp_path / f"slice_{quantity}.png"
        got = vis.plot_cross_section(pc, out, quantity=quantity, n=32)
        assert got == out and out.exists() and out.stat().st_size > 1000
        assert out.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"


def test_plot_isosurface_png(tmp_path):
    pytest.importorskip("matplotlib")
    pc = make_sphere(60, seed=8)
    out = tmp_path / "iso.png"
    got = vis.plot_isosurface(pc, out, res=16, levels=3)
    assert got == out and out.exists() and out.stat().st_size > 1000
    assert out.read_bytes()[:8] == b"\x89PNG\r\n\x1a\n"
