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


if __name__ == "__main__":
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dipole_tpu_trained.pt"
    main(steps, out)
