"""Synthesize stand-in clouds for the reference's missing demo blobs
(lion.xyz, vase.xyz, interpolate/consolidated.xyz — listed in
/root/reference/.MISSING_LARGE_BLOBS) with exact ground-truth normals.

Blobby shapes (lion, alien) are metaball implicit surfaces: the level set is
extracted with the framework's own marching-tetrahedra (dipole_tpu.vis.
isosurface), points are sampled area-weighted on the triangle soup, and the
GT normal at each sample is the analytic implicit gradient — one connected
component by construction, which is what dipole propagation needs (the
reference's lion is a single closed scan; demos/lion.sh).

The vase is an analytic surface of revolution with a bottom cap.

Usage: python tools/make_shape.py {lion|vase|alien} N out.xyz [seed]
"""
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


# metaball configs: (center, radius) balls; F(x) = sum r_i^2/|x-c_i|^2
LION_BALLS = [
    # body: an overlapping chain
    ((0.0, 0.0, 0.0), 0.50), ((0.45, 0.02, 0.0), 0.46), ((-0.45, 0.0, 0.0), 0.44),
    # chest + head + mane bulge
    ((0.85, 0.25, 0.0), 0.38), ((1.15, 0.55, 0.0), 0.30), ((0.95, 0.45, 0.0), 0.34),
    # legs
    ((0.55, -0.55, 0.22), 0.20), ((0.55, -0.55, -0.22), 0.20),
    ((-0.60, -0.55, 0.22), 0.20), ((-0.60, -0.55, -0.22), 0.20),
    ((0.55, -0.95, 0.22), 0.16), ((0.55, -0.95, -0.22), 0.16),
    ((-0.60, -0.95, 0.22), 0.16), ((-0.60, -0.95, -0.22), 0.16),
    # tail
    ((-0.95, 0.15, 0.0), 0.18), ((-1.2, 0.4, 0.0), 0.13),
]

ALIEN_BALLS = [
    # slender torso
    ((0.0, 0.0, 0.0), 0.34), ((0.0, 0.38, 0.0), 0.30), ((0.0, -0.38, 0.0), 0.30),
    # oversized head
    ((0.0, 0.85, 0.0), 0.42), ((0.0, 1.05, 0.0), 0.34),
    # arms
    ((0.42, 0.25, 0.0), 0.16), ((0.75, 0.05, 0.0), 0.14), ((1.0, -0.2, 0.0), 0.12),
    ((-0.42, 0.25, 0.0), 0.16), ((-0.75, 0.05, 0.0), 0.14), ((-1.0, -0.2, 0.0), 0.12),
    # legs
    ((0.2, -0.75, 0.0), 0.17), ((0.22, -1.1, 0.0), 0.14),
    ((-0.2, -0.75, 0.0), 0.17), ((-0.22, -1.1, 0.0), 0.14),
]


def _metaball(x, balls):
    """F and grad F of the blobby field sum r^2/d^2 at points x (n,3)."""
    F = np.zeros(len(x))
    G = np.zeros_like(x)
    for c, r in balls:
        d = x - np.asarray(c)
        d2 = np.maximum((d * d).sum(1), 1e-12)
        F += r * r / d2
        G += (-2.0 * r * r / (d2 * d2))[:, None] * d
    return F, G


def metaball_cloud(n, balls, iso=1.35, res=112, seed=0):
    from dipole_tpu.vis import isosurface

    pts = np.array([c for c, _ in balls])
    rad = np.array([r for _, r in balls])
    lo = (pts - 3 * rad[:, None]).min(0)
    hi = (pts + 3 * rad[:, None]).max(0)
    axes = [np.linspace(lo[k], hi[k], res) for k in range(3)]
    X, Y, Z = np.meshgrid(*axes, indexing="ij")
    grid = np.stack([X.ravel(), Y.ravel(), Z.ravel()], 1)
    F, _ = _metaball(grid, balls)
    verts, faces = isosurface(F.reshape(res, res, res), axes, iso)
    tri = verts.reshape(-1, 3, 3)

    rng = np.random.default_rng(seed)
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
    pick = rng.choice(len(tri), n, p=area / area.sum())
    u, v = rng.random((2, n))
    flip = u + v > 1
    u[flip], v[flip] = 1 - u[flip], 1 - v[flip]
    t = tri[pick]
    p = t[:, 0] + u[:, None] * (t[:, 1] - t[:, 0]) + v[:, None] * (t[:, 2] - t[:, 0])
    # GT normal: outward = direction of decreasing F = -grad
    _, G = _metaball(p, balls)
    nrm = -G / np.linalg.norm(G, axis=1, keepdims=True)
    return np.concatenate([p, nrm], 1).astype(np.float32)


def vase_cloud(n, seed=0):
    """Surface of revolution: belly + neck + flared lip, plus a bottom cap.
    Exact analytic normals."""
    rng = np.random.default_rng(seed)

    def profile(z):
        # z in [0, 1]; radius profile of the vase wall
        return (0.16 + 0.34 * np.exp(-((z - 0.32) / 0.24) ** 2)
                + 0.12 * np.exp(-((z - 1.0) / 0.10) ** 2))

    n_wall = int(n * 0.92)
    z = rng.random(n_wall)
    th = rng.random(n_wall) * 2 * np.pi
    r = profile(z)
    dz = 1e-5
    drdz = (profile(z + dz) - profile(z - dz)) / (2 * dz)
    x = np.stack([r * np.cos(th), r * np.sin(th), z], 1)
    # outward wall normal for x = (r cos, r sin, z): (cos, sin, -dr/dz)
    nr = np.stack([np.cos(th), np.sin(th), -drdz], 1)
    nr /= np.linalg.norm(nr, axis=1, keepdims=True)

    n_cap = n - n_wall
    rho = np.sqrt(rng.random(n_cap)) * profile(np.zeros(n_cap))
    tc = rng.random(n_cap) * 2 * np.pi
    cap = np.stack([rho * np.cos(tc), rho * np.sin(tc), np.zeros(n_cap)], 1)
    ncap = np.tile([0.0, 0.0, -1.0], (n_cap, 1))

    pc = np.concatenate(
        [np.concatenate([x, nr], 1), np.concatenate([cap, ncap], 1)])
    return pc[rng.permutation(len(pc))].astype(np.float32)


def hand_balls(seed):
    """A randomized hand: flattened palm slab + five finger chains + wrist.
    The finger chains are thin, near-parallel and close together — the
    category (articulated thin structures, cf. the reference's hands
    checkpoints) that blobby chains don't cover."""
    rng = np.random.default_rng(seed)
    balls = []
    # palm: 2x3 grid of mid-size balls in the y~0 plane, squashed look
    for ix in range(3):
        for iy in range(2):
            c = (-0.22 + 0.22 * ix + rng.normal(0, 0.01),
                 -0.05 + 0.16 * iy + rng.normal(0, 0.01),
                 rng.normal(0, 0.015))
            balls.append((c, float(rng.uniform(0.16, 0.19))))
    # wrist
    balls.append(((0.0, -0.30, 0.0), float(rng.uniform(0.14, 0.17))))
    balls.append(((0.0, -0.48, 0.0), float(rng.uniform(0.12, 0.15))))
    # four fingers: chains rising from the palm's top edge, slight spread
    # and curl; neighbouring fingers nearly touch
    for f in range(4):
        x0 = -0.24 + 0.175 * f + rng.normal(0, 0.008)
        spread = np.deg2rad(rng.uniform(-6, 6) + (f - 1.5) * 4.0)
        curl = np.deg2rad(rng.uniform(5, 30))
        seg = float(rng.uniform(0.085, 0.105))
        r = float(rng.uniform(0.055, 0.07))
        x, y, z, ang = x0, 0.24, 0.0, 0.0
        k = int(rng.integers(5, 7))
        for j in range(k):
            x += seg * np.sin(spread)
            y += seg * np.cos(spread) * np.cos(ang)
            z -= seg * np.sin(ang)
            ang += curl * rng.uniform(0.6, 1.4)
            balls.append(((x, y, z), r * (1.0 - 0.04 * j)))
    # thumb: shorter chain off the palm side, angled outward
    x, y, z = -0.36, -0.02, 0.02
    th = np.deg2rad(rng.uniform(35, 55))
    seg = float(rng.uniform(0.09, 0.11))
    r = float(rng.uniform(0.06, 0.075))
    for j in range(4):
        x -= seg * np.cos(th)
        y += seg * np.sin(th)
        z += seg * rng.uniform(0.0, 0.25)
        balls.append(((x, y, z), r * (1.0 - 0.05 * j)))
    return balls


def random_balls(seed, k=None):
    """A random connected metaball chain — unlimited distinct training
    shapes with exact GT normals. Each ball's center lies within the radius
    of a previously placed ball, so the level set stays one component."""
    rng = np.random.default_rng(seed)
    k = k or int(rng.integers(6, 15))
    balls = [((0.0, 0.0, 0.0), float(rng.uniform(0.3, 0.5)))]
    for _ in range(k - 1):
        c0, r0 = balls[int(rng.integers(len(balls)))]
        d = rng.normal(size=3)
        d /= np.linalg.norm(d)
        r = float(rng.uniform(0.12, 0.45))
        c = np.asarray(c0) + d * r0 * rng.uniform(0.5, 1.0)
        balls.append((tuple(c), r))
    return balls


SHAPES = {
    "lion": lambda n, seed: metaball_cloud(n, LION_BALLS, seed=seed),
    "alien": lambda n, seed: metaball_cloud(n, ALIEN_BALLS, seed=seed),
    "vase": vase_cloud,
    "blobs": lambda n, seed: metaball_cloud(n, random_balls(seed), seed=seed),
    "hand": lambda n, seed: metaball_cloud(n, hand_balls(seed), iso=1.6,
                                           res=160, seed=seed),
}


def main(argv):
    shape = argv[0]
    n = int(argv[1]) if len(argv) > 1 else 180000
    out = argv[2] if len(argv) > 2 else f"/tmp/{shape}.xyz"
    seed = int(argv[3]) if len(argv) > 3 else 0
    pc = SHAPES[shape](n, seed)
    from dipole_tpu.utils.io import export_pc

    export_pc(pc, out)
    print(f"wrote {out}: {len(pc)} points with GT normals")


if __name__ == "__main__":
    main(sys.argv[1:])
