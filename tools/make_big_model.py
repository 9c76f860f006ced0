"""Generate a synthetic large-scale test cloud (the reference's big_model /
lion demos reference blobs missing from its repo; this stands in): a
composite of spheres and boxes with ground-truth outward normals.

Usage: python tools/make_big_model.py N out.xyz
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make(n, seed=0):
    rng = np.random.default_rng(seed)
    parts = []
    # three spheres
    for c, rad in [((0, 0, 0), 1.0), ((1.6, 0, 0), 0.7), ((-1.2, 0.9, 0), 0.5)]:
        m = n // 4
        v = rng.normal(size=(m, 3))
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        parts.append(np.concatenate([v * rad + np.array(c), v], axis=1))
    # one box
    m = n - 3 * (n // 4)
    face = rng.integers(0, 6, m)
    uv = rng.uniform(-1, 1, (m, 2))
    pts = np.zeros((m, 3))
    nrm = np.zeros((m, 3))
    axis, s = face // 2, (face % 2) * 2.0 - 1.0
    for a in range(3):
        mask = axis == a
        others = [i for i in range(3) if i != a]
        pts[mask, a] = s[mask]
        pts[mask, others[0]] = uv[mask, 0]
        pts[mask, others[1]] = uv[mask, 1]
        nrm[mask, a] = s[mask]
    box = np.concatenate([pts * 0.6 + np.array([0, -1.6, 0]), nrm], axis=1)
    parts.append(box)
    pc = np.concatenate(parts).astype(np.float32)
    return pc[rng.permutation(len(pc))]


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500000
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/big_model.xyz"
    pc = make(n)
    from dipole_tpu.utils.io import export_pc

    export_pc(pc, out)
    print(f"wrote {out}: {len(pc)} points with GT normals")
