"""In-memory API (dipole_tpu.api) — array-in/array-out pipelines."""
import numpy as np
import pytest

import dipole_tpu
from dipole_tpu import api
from tests.conftest import make_sphere, scramble_signs


from dipole_tpu.ops.metrics import sign_agreement as _gt_agreement  # noqa: E402


def test_orient_simple_array_roundtrip():
    gt = make_sphere(300, seed=0)
    out = api.orient_simple(scramble_signs(gt, seed=2)[0])
    assert out.shape == (300, 6)
    # original coordinate space, all signs consistent with GT
    assert np.allclose(out[:, :3], gt[:, :3], atol=1e-5)
    assert _gt_agreement(out, gt) == 1.0


def test_orient_simple_estimates_missing_normals():
    # demo-data-like scale: the hybrid estimator's radius=0.1 is a fixed
    # reference semantic (util.py:551-567), so density must be realistic
    gt = make_sphere(2000, seed=1)
    gt[:, :3] *= 0.4
    out = api.orient_simple(gt[:, :3])  # 3-col input -> auto-estimate
    assert out.shape == (2000, 6)
    assert np.isfinite(out).all()
    assert _gt_agreement(out, gt) > 0.95


def test_orient_patches_array():
    gt = make_sphere(600, seed=2)
    out = api.orient_patches(scramble_signs(gt, seed=3)[0], number_parts=4,
                             minimum_points_per_patch=20, iters=1,
                             propagation_iters=1, diffuse=True)
    assert out.shape == (600, 6)
    assert _gt_agreement(out, gt) == 1.0


def test_orient_large_array():
    gt = make_sphere(800, seed=4)
    out = api.orient_large(scramble_signs(gt, seed=5)[0], number_parts=4,
                           minimum_points_per_patch=20, iters=1)
    assert out.shape == (800, 6)
    assert _gt_agreement(out, gt) == 1.0


def test_transfer_orientation_array():
    ref = make_sphere(400, seed=6)
    tgt = make_sphere(200, seed=7)
    out = api.transfer_orientation(ref, scramble_signs(tgt, seed=8)[0])
    assert out.shape == (200, 6)
    assert _gt_agreement(out, tgt) == 1.0
    # 3-col branch: field direction becomes the normal
    out3 = api.transfer_orientation(ref, tgt[:, :3])
    assert out3.shape == (200, 6)
    assert np.allclose(np.linalg.norm(out3[:, 3:], axis=1), 1.0, atol=1e-4)


def test_orient_auto_dispatch():
    gt = make_sphere(250, seed=9)
    out = dipole_tpu.orient(scramble_signs(gt, seed=10)[0])  # auto -> simple
    assert _gt_agreement(out, gt) == 1.0


def test_orient_tree_xie_via_api():
    gt = make_sphere(200, seed=11)
    out = dipole_tpu.orient(gt[:, :3], method="tree_xie", times=3)
    assert out.shape == (200, 6)
    assert np.isfinite(out).all()


def test_cli_matches_api(tmp_path):
    """The CLI is a thin wrapper: same array through file vs memory."""
    from dipole_tpu.cli import orient_simple as cli
    from dipole_tpu.utils.io import export_pc, load_xyz

    gt = scramble_signs(make_sphere(200, seed=12), seed=13)[0]
    export_pc(gt, tmp_path / "in.xyz")
    cli.main(["--pc", str(tmp_path / "in.xyz"),
              "--export_dir", str(tmp_path / "out"), "--diffuse"])
    file_out = load_xyz(tmp_path / "out" / "final_result.xyz")
    mem_out = api.orient_simple(load_xyz(tmp_path / "in.xyz"), diffuse=True)
    assert np.allclose(file_out, mem_out, atol=1e-4)


def test_orient_hoppe_maps_n_to_neighborhood(monkeypatch):
    """orient(method='hoppe', n=...) must reach hoppe_estimate as
    k_neighbor (it ignores max_nn), and results come back float32."""
    from dipole_tpu.serve import handlers

    seen = {}
    real = handlers.dispatch

    def spy(name, xyz, config, **kw):
        seen.update(config, _name=name)
        return real(name, xyz, config, **kw)

    monkeypatch.setattr(handlers, "dispatch", spy)
    pts = make_sphere(120, seed=5)[:, :3]
    out = dipole_tpu.orient(pts, method="hoppe", n=12)
    assert seen["_name"] == "hoppe_estimate"
    assert seen["k_neighbor"] == 12 and "max_nn" not in seen
    assert out.dtype == np.float32 and out.shape == (120, 6)


def test_orient_simple_batch_matches_per_cloud():
    """orient_simple_batch = per-cloud orient_simple, for mixed sizes and
    both diffuse modes (the vmapped lanes must be independent of batch
    composition)."""
    clouds = []
    for n, seed in ((260, 10), (300, 11), (180, 12)):
        pc, _ = scramble_signs(make_sphere(n, seed=seed), seed=seed + 50)
        clouds.append(pc)
    for diffuse in (False, True):
        outs = api.orient_simple_batch(clouds, diffuse=diffuse)
        assert len(outs) == len(clouds)
        for pc, got in zip(clouds, outs):
            want = api.orient_simple(pc, diffuse=diffuse)
            assert got.shape == want.shape
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_orient_simple_batch_single_and_empty():
    assert api.orient_simple_batch([]) == []
    pc, _ = scramble_signs(make_sphere(200, seed=20), seed=21)
    (out,) = api.orient_simple_batch([pc])
    np.testing.assert_allclose(out, api.orient_simple(pc), rtol=1e-5,
                               atol=1e-6)


def test_vote_margin_gates_flips():
    """vote_margin semantics: 0.0 is the reference vote bit-for-bit; 0.5
    suppresses every flip (softmax probs are strictly inside (0,1)), making
    the run identical to a no-model run with the same flags."""
    from pathlib import Path

    ckpt = Path(dipole_tpu.__file__).resolve().parent.parent / \
        "pre_trained_tpu" / "dipole_0.pt"
    gt = make_sphere(400, seed=9)
    pc, _ = scramble_signs(gt, seed=10)
    kw = dict(number_parts=2, minimum_points_per_patch=20, iters=1,
              propagation_iters=1)
    base = api.orient_patches(pc, models=[ckpt], **kw)
    m0 = api.orient_patches(pc, models=[ckpt], vote_margin=0.0, **kw)
    np.testing.assert_array_equal(m0, base)
    no_models = api.orient_patches(pc, **kw)
    gated = api.orient_patches(pc, models=[ckpt], vote_margin=0.5, **kw)
    np.testing.assert_array_equal(gated, no_models)


def test_fix_models_staged_noop_paths():
    """Staged fix pass no-op contracts: an empty fix_models list is exactly
    the unstaged pipeline, and fix_margin 0.5 suppresses every fix flip
    (softmax probs are strictly inside (0,1)) so the staged run is
    bit-identical to the unstaged one."""
    from pathlib import Path

    root = Path(dipole_tpu.__file__).resolve().parent.parent
    ckpt = root / "pre_trained_tpu" / "dipole_0.pt"
    fck = root / "pre_trained_tpu" / "dipole_r5_fixA.pt"
    gt = make_sphere(400, seed=9)
    pc, _ = scramble_signs(gt, seed=10)
    kw = dict(number_parts=2, minimum_points_per_patch=20, iters=1,
              propagation_iters=1)
    base = api.orient_patches(pc, models=[ckpt], **kw)
    empty = api.orient_patches(pc, models=[ckpt], fix_models=[], **kw)
    np.testing.assert_array_equal(empty, base)
    gated = api.orient_patches(pc, models=[ckpt], fix_models=[fck],
                               fix_margin=0.5, **kw)
    np.testing.assert_array_equal(gated, base)


def test_fix_pass_minority_guard(monkeypatch):
    """The fix pass flips margin-clearing strict-minority point sets and
    discards majority flips (a majority flip is a gauge claim, which the
    stage-1 models own)."""
    gt = make_sphere(300, seed=11)  # GT normals in: fix flips break them

    def fake_as_models(ms):
        return list(ms or [])

    def fake_vote(models, patches, **kw):
        frac = float(models[0])
        out = []
        for p in patches:
            probs = np.full(len(p), 0.9, np.float32)  # keep everything
            if frac:
                thr = np.quantile(p[:, 0], 1.0 - frac)
                probs[p[:, 0] > thr] = 0.05  # demand flips above quantile
            out.append((probs < 0.5, probs))
        return out

    monkeypatch.setattr(api, "_as_models", fake_as_models)
    monkeypatch.setattr(api, "ensemble_vote_patches", fake_vote)
    kw = dict(number_parts=1, minimum_points_per_patch=10, iters=1,
              propagation_iters=10)
    keep = api.orient_patches(gt, models=[0.0], fix_models=[0.0], **kw)
    minority = api.orient_patches(gt, models=[0.0], fix_models=[0.1], **kw)
    majority = api.orient_patches(gt, models=[0.0], fix_models=[0.7], **kw)
    # majority flip demanded -> discarded by the guard -> identical run
    np.testing.assert_array_equal(majority, keep)
    # minority flip demanded -> exactly the ~10% demanded points differ
    diff = (keep[:, 3:6] * minority[:, 3:6]).sum(-1) < 0
    assert 0 < diff.sum() <= 31
    assert diff.sum() >= 29


def test_fix_stats_instrumentation(monkeypatch):
    """fix_stats records one pass with per-patch probs/flip/guard and does
    not change results."""
    gt = make_sphere(300, seed=12)

    def fake_as_models(ms):
        return list(ms or [])

    def fake_vote(models, patches, **kw):
        return [(np.zeros(len(p), bool), np.full(len(p), 0.9, np.float32))
                for p in patches]

    monkeypatch.setattr(api, "_as_models", fake_as_models)
    monkeypatch.setattr(api, "ensemble_vote_patches", fake_vote)
    kw = dict(number_parts=1, minimum_points_per_patch=10, iters=1,
              propagation_iters=10)
    stats = {}
    out = api.orient_patches(gt, models=[1], fix_models=[1, 2],
                             fix_stats=stats, **kw)
    base = api.orient_patches(gt, models=[1], fix_models=[1, 2], **kw)
    np.testing.assert_array_equal(out, base)
    assert len(stats["passes"]) == 1  # fix_when='last' -> exactly one pass
    rec = stats["passes"][0][0]
    assert len(rec["probs_by_model"]) == 2  # fix_vote='all' keeps per-model
    assert rec["probs"].shape == rec["flip"].shape
    assert rec["normals"].shape == (len(rec["pidx"]), 3)
    assert not rec["flip"].any() and not rec["guarded"]


def test_orient_patches_consensus_majority(monkeypatch):
    """Majority over decorrelated runs keeps each point's most common
    sign, anchored to run 0 (global-flip-invariant)."""
    gt = make_sphere(50, seed=13)
    outs = []
    for flips in ([0, 1], [1, 2], [3]):
        o = gt.copy()
        o[flips, 3:6] *= -1
        outs.append(o)
    # run 2 additionally globally flipped: must not change the consensus
    outs[2][:, 3:6] *= -1
    calls = iter(outs)
    monkeypatch.setattr(api, "orient_patches",
                        lambda pts, models=(), vote_seed=1, **kw: next(calls))
    out = api.orient_patches_consensus(gt, runs=3)
    agree = (out[:, 3:6] * gt[:, 3:6]).sum(-1) > 0
    # point 1 wrong in 2/3 runs -> stays wrong; 0,2,3 wrong in 1/3 -> fixed
    assert not agree[1]
    assert agree[0] and agree[2] and agree[3] and agree[4:].all()


def test_vote_seed_default_reproduces():
    """vote_seed=1 is the published stream; another seed changes only the
    RNG (same shapes, valid output)."""
    from pathlib import Path

    ckpt = Path(dipole_tpu.__file__).resolve().parent.parent / \
        "pre_trained_tpu" / "dipole_0.pt"
    gt = make_sphere(400, seed=14)
    pc, _ = scramble_signs(gt, seed=15)
    kw = dict(number_parts=2, minimum_points_per_patch=20, iters=1,
              propagation_iters=1, models=[ckpt])
    a = api.orient_patches(pc, **kw)
    b = api.orient_patches(pc, vote_seed=1, **kw)
    np.testing.assert_array_equal(a, b)
    c = api.orient_patches(pc, vote_seed=7, **kw)
    assert c.shape == a.shape and np.isfinite(c).all()
