"""Train a PointCNN flip classifier from scratch on synthetic flipped
patches and save it as a torch-compatible .pt checkpoint + sidecar .txt
(the reference's checkpoint format), then evaluate its voting accuracy.

Usage: python tools/train_demo.py [steps] [out.pt]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402

from dipole_tpu import train  # noqa: E402
from dipole_tpu.models import checkpoints  # noqa: E402
from dipole_tpu.models.pointcnn import PointCNNParams  # noqa: E402


def main(steps=300, out="/tmp/dipole_tpu_trained.pt", pool=0.6):
    t0 = time.time()
    params, history = train.train(
        steps=steps, batch=16, n_points=128, pool=pool, verbose=False,
        learning_rate=3e-3,
    )
    dt = time.time() - t0
    losses = [h[0] for h in history]
    accs = [h[1] for h in history]
    print(f"trained {steps} steps in {dt:.1f}s "
          f"({steps * 16 / dt:.1f} patches/s): "
          f"loss {losses[0]:.3f} -> {losses[-1]:.3f}, "
          f"acc {accs[0]:.3f} -> {accs[-1]:.3f}")

    out = Path(out)
    checkpoints.save_state_dict({k: np.asarray(v) for k, v in params.items()}, out)
    out.with_suffix(".txt").write_text(f"pool: {pool}\n")
    print(f"saved {out} ({out.stat().st_size} bytes) + sidecar .txt")

    # reload through the inference path and evaluate voting accuracy
    model = PointCNNParams.from_files(out)
    key = jax.random.PRNGKey(123)
    pc, labels, valid = train.make_batch(key, 8, 128)
    correct = total = 0
    for b in range(8):
        logits = model.logits(np.asarray(pc[b]), key=jax.random.fold_in(key, b))
        pred = logits.argmax(-1)
        correct += int((pred == np.asarray(labels[b])).sum())
        total += 128
    print(f"held-out voting accuracy via checkpoint reload: {correct / total:.3f}")
    return correct / total


def main_real(steps=600, out="/tmp/dipole_tpu_trained_real.pt", pool=0.6):
    """Checkpoint-grade training demonstration (VERDICT r1 item 8): train on
    fandisk+ok real clouds, evaluate per-point flip accuracy on held-out
    hand, export the checkpoint, and drive it through the actual
    orient_pointcloud ensemble path on hand.xyz."""
    data = "/root/reference/data"
    t0 = time.time()
    params, history, eval_acc = train.train_on_clouds(
        [f"{data}/fandisk.xyz", f"{data}/ok.xyz"],
        steps=steps, batch=16, bucket=512, pool=pool,
        eval_paths=[f"{data}/hand.xyz"], verbose=True,
        learning_rate=1e-3,
    )
    dt = time.time() - t0
    print(f"trained {steps} steps in {dt:.1f}s; "
          f"held-out hand patch flip accuracy: {eval_acc:.4f}")

    out = Path(out)
    checkpoints.save_state_dict({k: np.asarray(v) for k, v in params.items()}, out)
    out.with_suffix(".txt").write_text(f"pool: {pool}\n")
    print(f"saved {out} ({out.stat().st_size} bytes) + sidecar .txt")

    # end-to-end: the trained checkpoint through the normal ensemble pipeline
    from dipole_tpu.cli import orient_pointcloud as op
    from tools.eval_result import main as eval_main

    exp = Path("/tmp/train_demo_hand")
    exp.mkdir(exist_ok=True)
    op.main([
        "--pc", f"{data}/hand.xyz", "--export_dir", str(exp),
        "--models", str(out),
        "--iters", "5", "--propagation_iters", "4", "--number_parts", "30",
        "--minimum_points_per_patch", "100", "--curvature_threshold", "0.01",
        "--diffuse", "--weighted_prop", "--estimate_normals",
    ])
    agree = eval_main(exp / "final_result.xyz", f"{data}/hand.xyz")
    print(f"orient_pointcloud(hand) with the trained checkpoint: "
          f"{agree:.4f} GT sign agreement")
    return eval_acc, agree


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--real":
        steps = int(sys.argv[2]) if len(sys.argv) > 2 else 600
        main_real(steps)
    else:
        steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
        out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dipole_tpu_trained.pt"
        main(steps, out)
