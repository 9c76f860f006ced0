"""Tools: format conversion and the big-model generator."""
import subprocess
import sys

import numpy as np

sys.path.insert(0, "tools")


def test_convert_roundtrip(tmp_path):
    from tests.conftest import make_sphere
    from dipole_tpu.utils.io import export_pc, load_point_cloud
    import importlib

    convert = importlib.import_module("convert")
    pc = make_sphere(50, seed=0)
    xyz = tmp_path / "a.xyz"
    ply = tmp_path / "a.ply"
    back = tmp_path / "b.xyz"
    export_pc(pc, xyz)
    convert.convert(xyz, ply)
    convert.convert(ply, back)
    out = load_point_cloud(back)
    np.testing.assert_allclose(out, pc, rtol=1e-5, atol=1e-6)


def test_make_big_model():
    import importlib

    mbm = importlib.import_module("make_big_model")
    pc = mbm.make(4000, seed=1)
    assert pc.shape == (4000, 6)
    n = np.linalg.norm(pc[:, 3:], axis=1)
    np.testing.assert_allclose(n, 1.0, rtol=1e-4)


def test_server_warmup_tiny():
    from dipole_tpu.serve.server_para import warmup

    # tiny sizes, subset of functions — must not raise
    warmup([64], functions=("simple_estimate", "hoppe_estimate"))


def test_make_shape_generators():
    from tools import make_shape

    for name in ["lion", "vase", "alien", "hand"]:
        pc = make_shape.SHAPES[name](2000, 0)
        assert pc.shape == (2000, 6)
        n = np.linalg.norm(pc[:, 3:], axis=1)
        np.testing.assert_allclose(n, 1.0, atol=1e-5)
        assert np.isfinite(pc).all()


def test_metaball_normals_point_outward():
    """GT normals of the blobby shapes must point along decreasing field,
    i.e. a small step along the normal lowers F below iso."""
    from tools import make_shape

    pc = make_shape.metaball_cloud(500, make_shape.LION_BALLS, seed=1)
    F0, _ = make_shape._metaball(pc[:, :3], make_shape.LION_BALLS)
    F1, _ = make_shape._metaball(pc[:, :3] + 0.02 * pc[:, 3:],
                                 make_shape.LION_BALLS)
    assert (F1 < F0).mean() > 0.99


def test_analysis_walkthrough(tmp_path):
    """The runnable C44 notebook replacement end-to-end on a subsample."""
    from tools import analysis_walkthrough

    table = analysis_walkthrough.main(str(tmp_path), n_segments=3,
                                      n_points=900)
    assert len(table) == 3
    assert all(np.isfinite(float(r["self_interaction_all"])) for r in table)
    assert (tmp_path / "reslog.json").exists()
    assert (tmp_path / "res0.xyz").exists()
    assert (tmp_path / "potential_iso.ply").stat().st_size > 100


def test_explicit_jax_platforms_env_is_honored():
    """`JAX_PLATFORMS=cpu <any entry point>` must pin the backend even when
    a remote-TPU plugin (axon) force-appends its platform at jax import —
    otherwise a down tunnel turns every CPU-forced CLI run into a
    multi-minute hang (utils/jaxsetup.py re-assert)."""
    import os
    import subprocess

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, "-c",
         "import dipole_tpu, jax; print(jax.config.jax_platforms)"],
        env=env, capture_output=True, text=True, timeout=120, cwd="/root/repo")
    assert out.returncode == 0, out.stderr[-2000:]
    assert out.stdout.strip().splitlines()[-1] == "cpu"
