"""CLI end-to-end tests on tiny clouds (argv-level, through main())."""
import numpy as np
import pytest

from dipole_tpu.utils.io import export_pc, load_xyz
from tests.conftest import make_sphere, scramble_signs


@pytest.fixture()
def tiny_cloud(tmp_path):
    gt = make_sphere(200, seed=0)
    scrambled, _ = scramble_signs(gt, seed=1)
    p = tmp_path / "tiny.xyz"
    export_pc(scrambled, p)
    return p, gt


def test_orient_simple_cli(tiny_cloud, tmp_path):
    from dipole_tpu.cli import orient_simple

    pc_path, gt = tiny_cloud
    out_dir = tmp_path / "out"
    orient_simple.main([
        "--pc", str(pc_path), "--export_dir", str(out_dir), "--diffuse",
    ])
    result = load_xyz(out_dir / "final_result.xyz")
    assert result.shape == (200, 6)
    agree = ((result[:, 3:] * gt[:, 3:]).sum(1) > 0).mean()
    assert max(agree, 1 - agree) > 0.99
    assert (out_dir / "opts.txt").exists()


def test_orient_pointcloud_cli_no_models(tiny_cloud, tmp_path):
    """Patch pipeline without a network ensemble (models=[]) still orients
    via orient_center + propagation."""
    from dipole_tpu.cli import orient_pointcloud

    pc_path, gt = tiny_cloud
    out_dir = tmp_path / "out2"
    orient_pointcloud.main([
        "--pc", str(pc_path), "--export_dir", str(out_dir),
        "--iters", "1", "--propagation_iters", "1",
        "--number_parts", "4", "--minimum_points_per_patch", "10",
        "--diffuse",
    ])
    result = load_xyz(out_dir / "final_result.xyz")
    agree = ((result[:, 3:] * gt[:, 3:]).sum(1) > 0).mean()
    assert max(agree, 1 - agree) > 0.95


def test_reference_orientation_cli(tmp_path):
    from dipole_tpu.cli import reference_orientation

    # dipole sheet: z=0 plane with +z normals. With the reference's field
    # sign convention the field *on* the sheet (between sources) points
    # along +n, so transferred normals for on-surface targets must be +z
    # (this is exactly the transfer use case: a consolidated cloud of the
    # same surface).
    r = np.random.default_rng(2)
    ref = np.zeros((300, 6), np.float32)
    ref[:, :2] = r.uniform(-1, 1, (300, 2))
    ref[:, 5] = 1.0
    tgt = np.zeros((150, 3), np.float32)
    tgt[:, :2] = r.uniform(-0.5, 0.5, (150, 2))
    ref_p = tmp_path / "ref.xyz"
    tgt_p = tmp_path / "in.xyz"
    out_p = tmp_path / "out.xyz"
    export_pc(ref, ref_p)
    export_pc(tgt, tgt_p)
    reference_orientation.main([
        "--input", str(tgt_p), "--reference", str(ref_p),
        "--output", str(out_p),
    ])
    result = load_xyz(out_p)
    assert result.shape == (150, 6)
    assert (result[:, 5] > 0).mean() > 0.95


def test_vote_starts_flag_parses_and_threads(tiny_cloud, tmp_path, monkeypatch):
    """--vote_starts reaches api.orient_patches (default 1; explicit value
    passed through)."""
    from dipole_tpu import api
    from dipole_tpu.cli import orient_pointcloud as op

    seen = {}
    real = api.orient_patches

    def spy(*args, **kwargs):
        seen["vote_starts"] = kwargs.get("vote_starts")
        return real(*args, **kwargs)

    monkeypatch.setattr(api, "orient_patches", spy)
    monkeypatch.setattr(op.api, "orient_patches", spy)
    pc_path, _ = tiny_cloud
    op.main(["--pc", str(pc_path), "--export_dir", str(tmp_path),
             "--iters", "1", "--vote_starts", "2"])
    assert seen["vote_starts"] == 2


def test_autowarm_gating(tmp_path, monkeypatch):
    """ensure_warm: CPU backends skip; the env hatch skips; on a TPU
    backend it runs the warm set once and the marker makes later calls
    no-ops (VERDICT r3 item 8)."""
    from dipole_tpu.utils import warmup

    monkeypatch.setenv("DIPOLE_TPU_CACHE_DIR", str(tmp_path))
    # CPU (the test backend): no warm, no marker
    assert warmup.ensure_warm(quiet=True) is False
    assert not warmup.marker_path().exists()

    # fake TPU backend + stubbed warm set
    class Dev:
        platform = "tpu"

    import jax

    monkeypatch.setattr(jax, "devices", lambda *a: [Dev()])
    calls = []
    monkeypatch.setattr(warmup, "_warm_simple", lambda: calls.append(1))
    monkeypatch.setenv("DIPOLE_TPU_NO_AUTOWARM", "1")
    assert warmup.ensure_warm(quiet=True) is False    # escape hatch
    monkeypatch.delenv("DIPOLE_TPU_NO_AUTOWARM")
    assert warmup.ensure_warm(quiet=True) is True
    assert calls == [1]
    assert warmup.marker_path().exists()
    assert warmup.ensure_warm(quiet=True) is False    # marker short-circuit
    assert calls == [1]


def test_vote_starts_warns_above_one():
    """--vote_starts > 1 is a measured footgun (hand 0.8991 at S=3 vs
    0.9379 at S=1, BASELINE.md) — the parser warns at parse time; S=1 is
    silent (VERDICT r3 item 9)."""
    import warnings

    from dipole_tpu.utils.config import get_parser

    base = ["--pc", "a.xyz", "--export_dir", "b"]
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        opts = get_parser().parse_args(base + ["--vote_starts", "3"])
    assert opts.vote_starts == 3
    assert any("vote_starts" in str(w.message) and "worse" in str(w.message)
               for w in rec)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        opts = get_parser().parse_args(base + ["--vote_starts", "1"])
    assert opts.vote_starts == 1
    assert not [w for w in rec if "vote_starts" in str(w.message)]
