"""The f64 cascade control experiment (VERDICT r3 item 3 / Missing #2).

Round 3 localized the golden-path residual (ours vs a fresh torch reference:
0.9875 torch_rng / 0.9973 starts-only) to the weighted greedy propagation's
argmax cascade amplifying sub-1e-6 f32 summation-order differences. The
missing control: accumulate that greedy in f64 on BOTH sides and measure
whether the spread collapses.

Both sides run the golden demos/ok config (iters 5, prop 4, parts 41,
min 100, diffuse, weighted_prop, file GT normals) with the bit-exact
torch-RNG start replay (--torch_rng 1), so the network stage is already
matched; only the propagation precision changes between the f32 and f64
rows:

  * reference: field_utils.strongest_field_propagation wrapped to cast
    pts/weights to torch.float64 (every field eval, interaction sum and
    cascade step in f64), result cast back — the network and sign fix stay
    the reference's own f32.
  * ours: ops.propagate.strongest_field_propagation_patches swapped for a
    NumPy float64 replica of the same math (pair field in f64 over target
    chunks, f64 segment sums, f64 diffuse; the patch-level greedy is
    already f64 on the host).

Run on any backend (CPU works; both rows must come from one process so the
comparison is self-consistent). Usage:
    python tools/f64_cascade_experiment.py [--skip-f32]
"""
import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools import run_reference_network as rrn  # noqa: E402  (installs shims)

import torch  # noqa: E402
import field_utils as ref_fu  # noqa: E402
import orient_pointcloud as ref_op  # noqa: E402


# ---------------------------------------------------------------------------
# Reference side: f64 wrapper around the weighted greedy
# ---------------------------------------------------------------------------

_ORIG_SFP = ref_fu.strongest_field_propagation


def _sfp_f64(pts, patches, all_patches, diffuse=False, weights=None):
    p64 = pts.double()
    w64 = weights.double() if weights is not None else None
    _ORIG_SFP(p64, patches, all_patches, diffuse=diffuse, weights=w64)
    pts.copy_(p64.float())
    return pts


# ---------------------------------------------------------------------------
# Ours: NumPy f64 replica of strongest_field_propagation_patches
# ---------------------------------------------------------------------------

def _group_interaction_f64(work, seg, P, eps=1e-5, chunk=256):
    """F[i, g] = sum over sources j in group g of (E_j(i) . n_i), all f64.
    Same math as fields.point_group_interaction (reference field_grad
    semantics: unit-R formulation, |R|^3 + eps denominator, -1 sign,
    zero-distance masked)."""
    pos = work[:, :3].astype(np.float64)
    mom = work[:, 3:6].astype(np.float64)          # already weight-scaled
    n = len(work)
    onehot = np.zeros((n, P))
    onehot[np.arange(n), seg] = 1.0
    F = np.zeros((n, P))
    for t0 in range(0, n, chunk):
        t1 = min(n, t0 + chunk)
        R = pos[:, None, :] - pos[None, t0:t1, :]   # (N, C, 3) source - target
        rn = np.linalg.norm(R, axis=-1)
        zero = rn == 0.0
        rs = np.where(zero, 1.0, rn)
        Ru = R / rs[:, :, None]
        Ru[zero] = 0.0
        pR = (mom[:, None, :] * Ru).sum(-1)
        E = 3.0 * pR[:, :, None] * Ru - mom[:, None, :]
        E[zero] = 0.0
        E = E / (rn ** 3 + eps)[:, :, None]
        E = -E                                       # field = -grad flip
        I = (E * mom[None, t0:t1, :]).sum(-1)        # (N, C): I[j, i]
        I[~np.isfinite(I)] = 0.0
        F[t0:t1] = I.T @ onehot                      # (C, P)
    return F


def _patches_f64(pts, filtered_patches, all_patches, diffuse=False,
                 weights=None, mesh=None):
    from dipole_tpu.ops.propagate import _flattest_patch, _greedy_patch_signs

    pts = np.asarray(pts, np.float32)
    n = len(pts)
    P = len(all_patches)
    if P == 0:
        return pts.copy()
    w = None
    if weights is not None:
        w = np.clip(np.asarray(weights, np.float64), 0.1, 1.0)
    seg = np.zeros(n, np.int32)
    for p, idx in enumerate(all_patches):
        seg[np.asarray(idx)] = p
    work = pts.astype(np.float64)
    if w is not None:
        work[:, 3:6] *= w[:, None]
    F = _group_interaction_f64(work, seg, P)
    W = np.zeros((P, P))
    np.add.at(W, seg, F)                             # f64 segment sum
    start = _flattest_patch(pts, all_patches)
    sign = _greedy_patch_signs(W, start)             # already f64 inside
    total = sign[seg].astype(np.float64).copy()
    if diffuse:
        own = F[np.arange(n), seg]
        acc = F @ sign.astype(np.float64) - own * sign[seg]
        for _, idx in filtered_patches:
            idx = np.asarray(idx)
            vote = np.where(acc[idx] * total[idx] > 0, 1.0, -1.0)
            total[idx] = total[idx] * vote
    out = pts.copy()
    out[:, 3:6] *= total[:, None].astype(np.float32)
    return out


def run_ours(out_dir: Path, f64: bool, seed: int = 1) -> np.ndarray:
    from dipole_tpu.cli import orient_pointcloud as ours_op
    from dipole_tpu.ops import propagate

    orig = propagate.strongest_field_propagation_patches
    if f64:
        propagate.strongest_field_propagation_patches = _patches_f64
    try:
        out_dir.mkdir(parents=True, exist_ok=True)
        ours_op.main([
            "--pc", rrn.DATA, "--export_dir", str(out_dir),
            "--models", f"{rrn.PRE}/hands2.pt", f"{rrn.PRE}/hands.pt",
            f"{rrn.PRE}/manmade.pt",
            "--iters", "5", "--propagation_iters", "4",
            "--number_parts", "41", "--minimum_points_per_patch", "100",
            "--curvature_threshold", "0.0", "--diffuse", "--weighted_prop",
            "--torch_rng", str(seed),
        ])
    finally:
        propagate.strongest_field_propagation_patches = orig
    return rrn.load6(out_dir / "final_result.xyz")


def run_reference(out_dir: Path, f64: bool, seed: int = 1) -> np.ndarray:
    out_dir.mkdir(parents=True, exist_ok=True)
    if f64:
        ref_fu.strongest_field_propagation = _sfp_f64
        ref_op.field_utils.strongest_field_propagation = _sfp_f64
    try:
        torch.manual_seed(seed)
        ref_op.run(rrn.golden_opts(out_dir, "ok"))
    finally:
        ref_fu.strongest_field_propagation = _ORIG_SFP
        ref_op.field_utils.strongest_field_propagation = _ORIG_SFP
    return rrn.load6(out_dir / "final_result.xyz")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-f32", action="store_true")
    args = ap.parse_args(argv)

    base = Path("/tmp/f64_cascade")
    gt = rrn.load6(rrn.DATA)
    rows = {}

    modes = [("f64", True)] if args.skip_f32 else [("f32", False),
                                                   ("f64", True)]
    for name, use64 in modes:
        t0 = time.time()
        ref = run_reference(base / f"ref_{name}", use64)
        ours = run_ours(base / f"ours_{name}", use64)
        rows[name] = {
            "ours_vs_ref": rrn.agreement(ours, ref),
            "ref_vs_gt": rrn.agreement(ref, gt),
            "ours_vs_gt": rrn.agreement(ours, gt),
            "time": time.time() - t0,
        }
        print(f"[{name}] ours-vs-ref {rows[name]['ours_vs_ref']:.6f}  "
              f"ref-vs-GT {rows[name]['ref_vs_gt']:.6f}  "
              f"ours-vs-GT {rows[name]['ours_vs_gt']:.6f}  "
              f"({rows[name]['time']:.0f}s)", flush=True)

    print("\nmatched-precision replay table (golden ok config, torch_rng):")
    for name, r in rows.items():
        print(f"  {name}: ours-vs-ref {r['ours_vs_ref']:.6f}  "
              f"ref-vs-GT {r['ref_vs_gt']:.6f}  ours-vs-GT {r['ours_vs_gt']:.6f}")


if __name__ == "__main__":
    main()
