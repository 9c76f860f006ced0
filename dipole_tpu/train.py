"""Training for the PointCNN flip classifier.

The reference ships pretrained checkpoints only (SURVEY §5.4 — no training
code anywhere); this module adds the training capability the checkpoints
imply: per-point binary classification of whether a normal is flipped
relative to the consistent orientation, trained on synthetically flipped
patches (class 1 = correctly oriented / keep, class 0 = flip — matching the
voting convention at inference_utils.py:47-49).

TPU-first: the step is one jitted SPMD program over a (data, model) mesh —
the patch batch is sharded over 'data' (DP), and the widest weight matrices
(the X-transform lifts and stage output projections) are sharded over
'model' on their output dimension (TP); XLA inserts the all-gathers /
reduce-scatters over ICI.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dipole_tpu.models import pointcnn

__all__ = ["init_params", "make_batch", "loss_fn", "make_train_step",
           "param_sharding", "train"]

# torch-style param shapes for a fresh (untrained) PointCNN
_STAGES = [("encoder.conv1", 16, 6, 32), ("encoder.conv2", 20, 32, 64),
           ("encoder.conv3", 20, 64, 128), ("encoder.conv4", 20, 128, 256),
           ("decoder.conv1", 20, 256, 128), ("decoder.conv2", 20, 128, 64),
           ("decoder.conv3", 20, 64, 32)]

# leaves wide enough to be worth tensor-sharding (output-dim partition)
_TP_SUFFIXES = ("mlp2.0.weight", "mlp2.0.bias", "conv.2.weight", "conv.2.bias")


def init_params(key) -> dict:
    """Glorot-ish init with the exact checkpoint key layout/shapes."""
    params = {}

    def linear(key, prefix, fin, fout):
        k1, _ = jax.random.split(key)
        lim = jnp.sqrt(6.0 / (fin + fout))
        params[f"{prefix}.weight"] = jax.random.uniform(k1, (fout, fin),
                                                        jnp.float32, -lim, lim)
        params[f"{prefix}.bias"] = jnp.zeros((fout,), jnp.float32)

    def conv1d(key, prefix, cout, cin_per_group, k):
        k1, _ = jax.random.split(key)
        lim = jnp.sqrt(6.0 / (cin_per_group * k + cout))
        params[f"{prefix}.weight"] = jax.random.uniform(
            k1, (cout, cin_per_group, k), jnp.float32, -lim, lim)
        params[f"{prefix}.bias"] = jnp.zeros((cout,), jnp.float32)

    for prefix, K, C_in, C_out in _STAGES:
        cd = max(1, C_in // 4)
        dm = -(-C_out // C_in)
        key, *ks = jax.random.split(key, 6)
        linear(ks[0], f"{prefix}.mlp1.0", 3, cd)
        linear(ks[1], f"{prefix}.mlp1.3", cd, cd)
        linear(ks[2], f"{prefix}.mlp2.0", 3 * K, K * K)
        conv1d(ks[3], f"{prefix}.mlp2.4", K * K, 1, K)
        conv1d(ks[4], f"{prefix}.mlp2.8", K * K, 1, K)
        key, k1, k2 = jax.random.split(key, 3)
        conv1d(k1, f"{prefix}.conv.0", C_in * dm, 1, K)
        linear(k2, f"{prefix}.conv.2", C_in * dm, C_out)
    key, k1 = jax.random.split(key)
    lim = jnp.sqrt(6.0 / 34)
    params["decoder.lin4.weight"] = jax.random.uniform(k1, (2, 32), jnp.float32,
                                                       -lim, lim)
    params["decoder.lin4.bias"] = jnp.zeros((2,), jnp.float32)
    return params


def make_batch(key, batch: int, n_points: int, flip_frac: float = 0.4):
    """Synthetic training batch: noisy sphere-cap patches with a random
    subset of normals flipped. Returns (pc (B,N,6), labels (B,N) int32
    {1 keep, 0 flip}, valid (B,N))."""
    rng = np.random.default_rng(int(jax.random.randint(key, (), 0, 2**31 - 1)))
    pcs = np.empty((batch, n_points, 6), np.float32)
    labels = np.empty((batch, n_points), np.int32)
    for b in range(batch):
        center = rng.normal(size=3)
        center /= np.linalg.norm(center)
        v = rng.normal(size=(n_points, 3)) * 0.35 + center
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        pts = v + rng.normal(scale=0.01, size=(n_points, 3))
        nrm = v.copy()
        flip = rng.random(n_points) < flip_frac
        nrm[flip] *= -1
        pcs[b, :, :3] = pts
        pcs[b, :, 3:] = nrm
        labels[b] = _canonical_labels((~flip).astype(np.int32))
    valid = np.ones((batch, n_points), bool)
    return jnp.asarray(pcs), jnp.asarray(labels), jnp.asarray(valid)


def calibrate_init(params: dict, probe_pc, pool: float = 0.6,
                   target_std: float = 1.0) -> dict:
    """LSUV-style init calibration: forward one probe patch stage by stage
    and rescale each stage's output projection (conv.2 / lin4) so its
    pre-activation std is ~target_std. Without this the 7-stage composition
    attenuates multiplicatively — fresh-init logits come out at std ~4e-10
    and gradients sit at the float32 noise floor, which is why early
    training runs were stuck at ln 2. Returns the calibrated params dict."""
    from dipole_tpu.models.pointcnn import (_canonicalize, _fps_masked,
                                            _interpolate, _xconv)

    params = dict(params)
    pc = jnp.asarray(np.asarray(probe_pc, np.float32))
    n = pc.shape[0]
    valid = jnp.ones((n,), bool)
    m1 = int(-(-n * pool // 1))
    m2 = int(-(-m1 * pool // 1))
    x, pos1 = _canonicalize(pc, valid)

    def scaled(prefix, h):
        s = float(jnp.std(h))
        f = target_std / max(s, 1e-30)
        params[f"{prefix}.weight"] = params[f"{prefix}.weight"] * f
        params[f"{prefix}.bias"] = params[f"{prefix}.bias"] * f
        return h * f

    def stage(prefix, h, pos, K, cin, cout):
        h = _xconv(params, prefix, h, pos, K, cin, cout)
        return jax.nn.relu(scaled(f"{prefix}.conv.2", h))

    x = stage("encoder.conv1", x, pos1, 16, 6, 32)
    sel1 = _fps_masked(pos1, valid, m1, 0)
    pos2 = pos1[sel1]
    x = stage("encoder.conv2", x[sel1], pos2, 20, 32, 64)
    sel2 = _fps_masked(pos2, jnp.ones((m1,), bool), m2, 0)
    pos3 = pos2[sel2]
    x = stage("encoder.conv3", x[sel2], pos3, 20, 64, 128)
    x = stage("encoder.conv4", x, pos3, 20, 128, 256)
    x = stage("decoder.conv1", x, pos3, 20, 256, 128)
    x = stage("decoder.conv2", _interpolate(x, pos3, pos2), pos2, 20, 128, 64)
    x = stage("decoder.conv3", _interpolate(x, pos2, pos1), pos1, 20, 64, 32)
    h = jnp.dot(x, params["decoder.lin4.weight"].T) + params["decoder.lin4.bias"]
    scaled("decoder.lin4", h)
    return params


def _probe_patch(rng_seed: int = 0, n: int = 128) -> np.ndarray:
    rng = np.random.default_rng(rng_seed)
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pc = np.concatenate([v + rng.normal(scale=0.01, size=(n, 3)), v], axis=1)
    return pc.astype(np.float32)


def _canonical_labels(labels: np.ndarray) -> np.ndarray:
    """Resolve the per-patch sign gauge: a patch's consistent orientation is
    only defined up to one global flip (propagation fixes the patch sign
    later — the network's job is *internal* consistency, reference
    orient_pointcloud.py:45-54). Pick the gauge with fewer flips (majority
    'keep'), otherwise the two-class target is exactly symmetric and the
    Bayes-optimal net degenerates to 50/50."""
    return labels if labels.mean() >= 0.5 else 1 - labels


def loss_fn(params, pc, labels, valid, keys, pool, m1: int, m2: int,
            class_balance: bool = False, gauge_free: bool = False,
            keep_bias: float = 0.5):
    """Per-point cross-entropy over the flip classes.

    class_balance=True reweights each point so both label classes
    contribute equal mass *within each patch* — without it, the gauge
    convention (majority = keep, ~85 % of points on real clouds) admits a
    trivial minimum where the net predicts the patch majority everywhere
    and never fixes an individual point. The balanced weights are
    gauge-invariant (inverting every label swaps the class counts, giving
    the same per-point weight), so they compose with gauge_free.

    gauge_free=True takes the per-patch minimum of the CE under the two
    label gauges (labels vs 1-labels). A patch's orientation is only
    defined up to one global flip — propagation assigns the patch sign
    later — so the as-labeled CE is ill-posed: on a sign-scrambled patch
    the majority-keep gauge is a coin flip, and a net that predicts a
    PERFECT coherent field is 100 % wrong under CE whenever it lands in
    the other gauge, making keep-all (CE ln 2) the true optimum. That is
    the measured round-4 collapse (BASELINE training section). The min
    over gauges restores the actual task: internal consistency.

    keep_bias (requires class_balance): mass assigned to the keep class
    (labels==1) vs flip, default 0.5 = symmetric. Final-pass fixers want
    PRECISION — a false flip at the last pass is never undone (measured:
    one fixA pass wrecks hand 0.9763 -> 0.7053) — so >0.5 trains the net
    to be shy about flipping. Under gauge_free the inverted-gauge branch
    swaps the class masses (inverting labels swaps the class roles), so
    the bias stays anchored to the patch's presented orientation."""
    logits = jax.vmap(
        lambda c, v, k: pointcnn._forward(params, c, v, k, pool, m1, m2)
    )(pc, valid, keys)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    w = valid.astype(jnp.float32)
    w_inv = w
    if class_balance:
        pos = w * (labels == 1)
        neg = w * (labels == 0)
        n1 = pos.sum(-1, keepdims=True)
        n0 = neg.sum(-1, keepdims=True)
        kb = jnp.float32(keep_bias)
        w = (kb * pos / jnp.maximum(n1, 1.0)
             + (1 - kb) * neg / jnp.maximum(n0, 1.0))
        # inverted gauge swaps the class roles, so the bias swaps with it
        w_inv = ((1 - kb) * pos / jnp.maximum(n1, 1.0)
                 + kb * neg / jnp.maximum(n0, 1.0))
    vmask = valid.astype(jnp.float32)
    if gauge_free:
        inv = -jnp.take_along_axis(logp, (1 - labels)[..., None],
                                   axis=-1)[..., 0]
        wsum = jnp.maximum(w.sum(-1), 1e-9)
        wsum_inv = jnp.maximum(w_inv.sum(-1), 1e-9)
        per_patch = jnp.minimum((nll * w).sum(-1) / wsum,
                                (inv * w_inv).sum(-1) / wsum_inv)
        loss = per_patch.mean()
        pred = logits.argmax(-1)
        agree = ((pred == labels) & valid).sum(-1) / jnp.maximum(
            vmask.sum(-1), 1.0)
        acc = jnp.maximum(agree, vmask.sum(-1) / jnp.maximum(
            vmask.sum(-1), 1.0) - agree).mean()
    else:
        loss = (nll * w).sum() / jnp.maximum(w.sum(), 1e-9)
        acc = (((logits.argmax(-1) == labels) & valid).sum()
               / jnp.maximum(vmask.sum(), 1.0))
    return loss, acc


def param_sharding(mesh: Mesh, params: dict):
    """NamedShardings: TP on the wide matrices' output dim, replicate the
    rest."""
    out = {}
    has_model = "model" in mesh.axis_names and mesh.shape["model"] > 1
    for k, v in params.items():
        if has_model and k.endswith(_TP_SUFFIXES) and v.shape[0] % mesh.shape["model"] == 0:
            spec = P("model") if v.ndim == 1 else P("model", *([None] * (v.ndim - 1)))
        else:
            spec = P()
        out[k] = NamedSharding(mesh, spec)
    return out


def make_train_step(mesh: Mesh, pool: float, m1: int, m2: int,
                    learning_rate: float = 1e-3, total_steps: int = 2000,
                    class_balance: bool = False, gauge_free: bool = False,
                    keep_bias: float = 0.5):
    """Build (opt, jitted train_step) with DP batch sharding + TP params.
    Global-norm clipping + warmup-cosine: the XConv composition has sharp
    curvature (single-batch overfit runs show loss spikes of 50x without
    clipping)."""
    sched = optax.warmup_cosine_decay_schedule(
        0.0, learning_rate, warmup_steps=min(100, total_steps // 10),
        decay_steps=total_steps, end_value=learning_rate * 0.05)
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(sched))

    def step(params, opt_state, pc, labels, valid, keys):
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, pc, labels, valid, keys, jnp.float32(pool), m1, m2,
            class_balance, gauge_free, keep_bias,
        )
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, acc

    data_sh = NamedSharding(mesh, P("data"))
    jitted = jax.jit(
        step,
        in_shardings=(None, None, data_sh, data_sh, data_sh, data_sh),
        static_argnums=(),
    )
    return opt, jitted


def train(steps: int = 20, batch: int = 8, n_points: int = 128,
          pool: float = 0.6, mesh: Mesh | None = None, seed: int = 0,
          learning_rate: float = 1e-3, verbose: bool = True):
    """Train a fresh PointCNN on synthetic flips; returns (params, history)."""
    if mesh is None:
        devs = jax.devices()
        nd = len(devs)
        while batch % nd:  # data axis must divide the batch
            nd -= 1
        mesh = Mesh(np.array(devs[:nd]).reshape(nd, 1), ("data", "model"))
    key = jax.random.PRNGKey(seed)
    key, pk = jax.random.split(key)
    params = calibrate_init(init_params(pk), _probe_patch(seed, n_points), pool)
    shardings = param_sharding(mesh, params)
    params = {k: jax.device_put(v, shardings[k]) for k, v in params.items()}
    m1 = int(-(-n_points * pool // 1))
    m2 = int(-(-m1 * pool // 1))
    opt, step_fn = make_train_step(mesh, pool, m1, m2, learning_rate,
                                   total_steps=steps)
    opt_state = opt.init(params)
    history = []
    for i in range(steps):
        key, bk, fk = jax.random.split(key, 3)
        pc, labels, valid = make_batch(bk, batch, n_points)
        keys = jax.random.split(fk, batch)
        params, opt_state, loss, acc = step_fn(params, opt_state, pc, labels,
                                               valid, keys)
        history.append((float(loss), float(acc)))
        if verbose:
            print(f"step {i}: loss {float(loss):.4f} acc {float(acc):.4f}")
    return params, history


# ---------------------------------------------------------------------------
# Training on real clouds: reproduce the inference-time distribution — patch
# the cloud, estimate unoriented normals, initialize with orient_center, and
# label each point by whether that initial normal agrees with ground truth
# (class 1 keep / class 0 flip). This is exactly the correction the ensemble
# applies inside orient_pointcloud/orient_large.
# ---------------------------------------------------------------------------

def patches_from_cloud(path, number_parts: int = 30, min_patch: int = 100,
                       max_nn: int = 30, seed: int = 0):
    """[(patch (n,6) with orient_center-initialized estimated normals,
    labels (n,) int32)] from a ground-truth-oriented .xyz/.ply cloud."""
    from dipole_tpu.ops.estimate import estimate_normals
    from dipole_tpu.ops.patching import divide_pc
    from dipole_tpu.utils.io import Transform, load_point_cloud, orient_center_np

    gt = load_point_cloud(path)
    gt, _ = Transform.trans(gt)
    est = estimate_normals(gt, max_nn=max_nn)
    out = []
    for idx in divide_pc(gt[:, :3], number_parts, min_patch=min_patch):
        patch = orient_center_np(est[idx])
        labels = ((patch[:, 3:6] * gt[idx, 3:6]).sum(-1) > 0).astype(np.int32)
        out.append((patch.astype(np.float32), _canonical_labels(labels)))
    return out


def _augment(patch, labels, rng, region_flip: float = 0.0,
             point_flip: float = 0.0, scramble: float = 0.0,
             region_draws: int = 1,
             region_range: tuple = (0.05, 0.5)):
    """Random rotation + random whole-patch flip (labels invert).

    region_flip: probability of flipping one random contiguous region (the
    5-50 % of points nearest a random seed point) — simulates the
    half-wrong patches a propagation cascade hands the network mid-pipeline.
    region_draws: independent draws of the region flip (each with
    probability region_flip) — >1 yields multi-region error patterns,
    the dominant mid-pipeline state on articulated shapes.
    region_range: (lo, hi) bounds of the flipped-region size as a patch
    fraction. The default (0.05, 0.5) matches the mid-pipeline cascade
    states; the measured CONVERGED-pipeline residue is smaller regions
    (5-27 % with a sub-5 % tail — tools/e2e_patch_diagnostic.py,
    2026-08-19), so final-pass fixers train with (0.02, 0.3).
    point_flip: probability of sparse random per-point flips (each point
    w.p. 2-15 %) — simulates residual per-point noise in later iterations.
    scramble: probability of randomizing EVERY point's sign (each w.p. 50 %)
    — the decisive anti-collapse augmentation: with orient_center-only
    inits the majority-keep gauge admits an ~85 %-accuracy shortcut
    ("predict the patch majority everywhere") that plain training never
    leaves (measured, BASELINE round-4 training section); a scrambled patch
    has no majority to parrot, so the net must recompute a coherent
    orientation field from the geometry — which is also what makes it fix
    individual points at inference.
    All variants flip the *input* normals and invert the affected labels,
    then re-resolve the majority-keep gauge, so the per-point correction
    task stays exactly the inference-time task."""
    q = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(q)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    p = patch.copy()
    p[:, :3] = p[:, :3] @ Q
    p[:, 3:6] = p[:, 3:6] @ Q
    lab = labels.copy()
    if scramble and rng.random() < scramble:
        mask = rng.random(len(p)) < 0.5
        p[mask, 3:6] *= -1
        lab[mask] = 1 - lab[mask]
    for _ in range(region_draws):
        if region_flip and rng.random() < region_flip:
            c = int(rng.integers(len(p)))
            m = max(1, int(len(p) * rng.uniform(*region_range)))
            d = ((p[:, :3] - p[c, :3]) ** 2).sum(-1)
            sel = np.argpartition(d, min(m, len(p) - 1))[:m]
            p[sel, 3:6] *= -1
            lab[sel] = 1 - lab[sel]
    if point_flip and rng.random() < point_flip:
        mask = rng.random(len(p)) < rng.uniform(0.02, 0.15)
        p[mask, 3:6] *= -1
        lab[mask] = 1 - lab[mask]
    if rng.random() < 0.5:
        p[:, 3:6] *= -1
        lab = 1 - lab
    return p, _canonical_labels(lab)


def train_on_clouds(paths, steps: int = 200, batch: int = 8,
                    bucket: int = 512, pool: float = 0.6, seed: int = 0,
                    learning_rate: float = 3e-3, mesh: Mesh | None = None,
                    eval_paths=(), verbose: bool = True,
                    number_parts: int = 30, min_patch: int = 100,
                    parts_list=None, class_balance: bool = False,
                    region_flip: float = 0.0, point_flip: float = 0.0,
                    scramble: float = 0.0, gauge_free: bool = False,
                    region_draws: int = 1,
                    region_range: tuple = (0.05, 0.5),
                    keep_bias: float = 0.5, extra_data=(),
                    snapshot_every: int = 0, snapshot_fn=None):
    """Train the flip classifier on real GT-oriented clouds. Returns
    (params, history, eval_accuracy or None).

    snapshot_every/snapshot_fn: call snapshot_fn(step, params) every
    snapshot_every steps (and at the last step) — one full run then yields
    checkpoints along the schedule, so late-schedule drift (the round-4
    recipe-4 failure mode) is diagnosable from a single training run.

    parts_list: optional iterable of number_parts values — each cloud is
    patched once per value, so the net sees the same surface at several
    patch scales (the inference-time scale varies per demo config). A path
    may also be a (path, parts_list) pair to override the scales per cloud
    (larger clouds need finer grids for comparable patch sizes)."""
    rng = np.random.default_rng(seed)
    data = []
    for p in paths:
        if isinstance(p, tuple):
            p, cloud_parts = p
        else:
            cloud_parts = parts_list or [number_parts]
        for nparts in cloud_parts:
            data.extend(patches_from_cloud(p, nparts, min_patch, seed=seed))
    data.extend(extra_data)  # e.g. mined mid-pipeline states
    if not data:
        raise ValueError("no training patches")

    if mesh is None:
        devs = jax.devices()
        nd = len(devs)
        while batch % nd:
            nd -= 1
        mesh = Mesh(np.array(devs[:nd]).reshape(nd, 1), ("data", "model"))
    key = jax.random.PRNGKey(seed)
    key, pk = jax.random.split(key)
    probe = data[0][0][:min(len(data[0][0]), bucket)]
    params = calibrate_init(init_params(pk), probe, pool)
    shardings = param_sharding(mesh, params)
    params = {k: jax.device_put(v, shardings[k]) for k, v in params.items()}
    m1 = int(-(-bucket * pool // 1))
    m2 = int(-(-m1 * pool // 1))
    opt, step_fn = make_train_step(mesh, pool, m1, m2, learning_rate,
                                   total_steps=steps,
                                   class_balance=class_balance,
                                   gauge_free=gauge_free,
                                   keep_bias=keep_bias)
    opt_state = opt.init(params)

    def batch_of(samples):
        pc = np.zeros((batch, bucket, 6), np.float32)
        lab = np.zeros((batch, bucket), np.int32)
        valid = np.zeros((batch, bucket), bool)
        for i, (p, l) in enumerate(samples):
            if len(p) > bucket:
                sel = rng.permutation(len(p))[:bucket]
                p, l = p[sel], l[sel]
            p, l = _augment(p, l, rng, region_flip=region_flip,
                            point_flip=point_flip, scramble=scramble,
                            region_draws=region_draws,
                            region_range=region_range)
            pc[i, : len(p)] = p
            lab[i, : len(p)] = l
            valid[i, : len(p)] = True
        return jnp.asarray(pc), jnp.asarray(lab), jnp.asarray(valid)

    history = []
    for i in range(steps):
        samples = [data[rng.integers(len(data))] for _ in range(batch)]
        pc, lab, valid = batch_of(samples)
        key, fk = jax.random.split(key)
        keys = jax.random.split(fk, batch)
        params, opt_state, loss, acc = step_fn(params, opt_state, pc, lab,
                                               valid, keys)
        history.append((float(loss), float(acc)))
        if verbose and (i % 20 == 0 or i == steps - 1):
            print(f"step {i}: loss {float(loss):.4f} acc {float(acc):.4f}")
        if snapshot_fn and snapshot_every and (
                (i + 1) % snapshot_every == 0 or i == steps - 1):
            snapshot_fn(i + 1, params)

    eval_acc = None
    if eval_paths:
        correct = total = 0
        for p in eval_paths:
            for patch, lab in patches_from_cloud(p, number_parts, min_patch,
                                                 seed=seed + 1):
                if len(patch) > bucket:
                    sel = rng.permutation(len(patch))[:bucket]
                    patch, lab = patch[sel], lab[sel]
                logits = pointcnn.pointcnn_logits(params, pool, patch,
                                                  key=jax.random.PRNGKey(0),
                                                  bucket=bucket)
                match = int((logits.argmax(-1) == lab).sum())
                # per-patch gauge-free score when training gauge-free: the
                # patch sign belongs to propagation, not the net
                correct += max(match, len(lab) - match) if gauge_free else match
                total += len(lab)
        eval_acc = correct / max(total, 1)
        if verbose:
            print(f"eval accuracy on held-out clouds: {eval_acc:.4f}")
    return params, history, eval_acc
