"""Ensemble inference utilities (reference inference_utils.py).

load_model_from_file (:38-44) -> PointCNNParams.from_files (torch-free)
voting_policy (:47-49)        -> mean softmax flip probability, flip < 0.5
"""
from __future__ import annotations

import numpy as np

from dipole_tpu.models.pointcnn import PointCNNParams

__all__ = ["load_model_from_file", "voting_policy", "ensemble_vote"]


def load_model_from_file(path) -> PointCNNParams:
    return PointCNNParams.from_files(path)


def _softmax(x: np.ndarray) -> np.ndarray:
    x = x - x.max(axis=-1, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=-1, keepdims=True)


def voting_policy(probs_list):
    """Mean per-point P(flip) across models; flip where < 0.5 (reference
    inference_utils.py:47-49). Returns (flip_mask, probs)."""
    probs = np.stack([np.asarray(p) for p in probs_list], axis=0).mean(axis=0)
    return probs < 0.5, probs


def _canon_reference(patch: np.ndarray) -> np.ndarray:
    """Reference-exact patch canonicalization (reference models/pointcnn.py:
    36-38 + util.rotate_to_principle_components, util.py:503-517): center
    xyz, PCA-rotate (xyz scaled by sqrt of the largest eigenvalue, normals
    rotated unscaled).

    Computed with torch when importable so the LAPACK eigenvector SIGN
    convention matches the torch pipeline bit-for-bit (the only remaining
    divergence of the golden replay: measured 137/2734 per-pass flip diffs
    from our closed-form eigh vs 0 with the torch basis). The numpy fallback
    keeps the same recipe under numpy's LAPACK."""
    patch = np.asarray(patch, np.float32)
    try:
        import torch

        x = torch.tensor(patch.copy())
        x[:, :3] -= x[:, :3].mean(dim=0)
        temp = x[:, :3] - x.mean(dim=0)[None, :3]
        cov = temp.transpose(0, 1) @ temp / x.shape[0]
        e, v = torch.linalg.eigh(cov, UPLO="U")  # torch.symeig's default half
        rotated = (x[:, :3] @ v) / torch.sqrt(e[2])
        return torch.cat([rotated, x[:, 3:] @ v], dim=-1).numpy()
    except ImportError:
        x = patch.copy()
        x[:, :3] -= x[:, :3].mean(0)
        temp = x[:, :3] - x.mean(0)[None, :3]
        cov = temp.T @ temp / np.float32(x.shape[0])
        e, V = np.linalg.eigh(cov)
        out = np.empty_like(x)
        out[:, :3] = (x[:, :3] @ V) / np.sqrt(e[2])
        out[:, 3:] = x[:, 3:] @ V
        return out


def _model_key(key, model, index: int):
    """Per-model PRNG key folded over a content digest of the checkpoint
    (not the model-list index), so --models ordering cannot move results.
    Falls back to the index for model objects without a digest. Derived on
    the host CPU backend (bit-identical threefry; avoids remote-dispatch
    rounds, see pointcnn.derive_keys_cpu)."""
    import jax

    from dipole_tpu.models.pointcnn import derive_keys_cpu

    digest = getattr(model, "content_digest", None)
    return derive_keys_cpu(lambda put: jax.random.fold_in(
        put(key), digest if digest is not None else index))


def ensemble_vote(models, patch, key=None):
    """Run every model on a patch and vote. Returns (flip_mask, probs)."""
    import jax

    if key is None:
        key = jax.random.PRNGKey(0)
    votes = []
    for mi, m in enumerate(models):
        logits = m.logits(patch, key=_model_key(key, m, mi))
        votes.append(_softmax(logits)[:, 1])
    return voting_policy(votes)


def ensemble_vote_patches(models, patches, key=None, mesh=None,
                          torch_rng=None, vote_starts: int = 1,
                          fps_starts: str = "rng"):
    """Ensemble-vote many ragged patches at once: patches are grouped into
    shared padded buckets and each model runs one vmapped forward per group
    (instead of len(models) * len(patches) sequential dispatches). Exact
    per-patch semantics are unchanged — each forward only ever reads its own
    patch. Returns a list of (flip_mask, probs) aligned with `patches`.
    mesh: optional Mesh — the patch batch is sharded over its devices.

    vote_starts: FPS-start ensembling — each model votes `vote_starts`
    times with independent FPS start draws and the vote pool grows to
    len(models) * vote_starts. The reference draws ONE start per model per
    patch (pointcnn.py:68,73), which makes small ensembles start-noise
    limited (the shipped trio swings percents on hard shapes, BASELINE.md);
    extra starts average that noise out at vote_starts x forward cost.
    vote_starts=1 (default) is bit-identical to the reference semantics,
    and the s=0 draw of every model is unchanged by raising it.

    torch_rng: optional utils.torch_rng.TorchMT19937 — FPS starts are drawn
    from it host-side in the reference's consumption order (patch-major,
    model-inner; one randint(n) + one randint(ceil(pool*n)) per forward,
    reference orient_pointcloud.py:48 + the fps calls at pointcnn.py:68,73),
    replaying the torch pipeline's randomness bit-exactly. The stream is
    stateful: the same generator must be passed across iterations.
    Incompatible with vote_starts > 1 (the replay defines one start per
    model).

    fps_starts: 'rng' (reference semantics — one key-derived random start
    per model per patch) or 'centroid' (deterministic geometry-derived
    starts, pointcnn.centroid_starts: every model anchors at the
    patch-centroid-nearest point — no start noise at all)."""
    import math

    import jax

    from dipole_tpu.models.pointcnn import (_bucket, centroid_starts,
                                            derive_keys_cpu,
                                            pointcnn_logits_batched)

    patches = [np.asarray(p) for p in patches]
    vote_starts = int(vote_starts)
    if vote_starts < 1:
        raise ValueError("vote_starts must be >= 1")
    if torch_rng is not None and vote_starts != 1:
        raise ValueError("vote_starts > 1 is incompatible with the torch_rng "
                         "replay (the replayed stream defines exactly one "
                         "start per model per patch)")
    if fps_starts not in ("rng", "centroid"):
        raise ValueError(f"fps_starts must be 'rng' or 'centroid', "
                         f"got {fps_starts!r}")
    if fps_starts == "centroid" and torch_rng is not None:
        raise ValueError("fps_starts='centroid' is incompatible with the "
                         "torch_rng replay (the replayed stream defines the "
                         "starts)")
    if fps_starts == "centroid" and vote_starts != 1:
        raise ValueError("vote_starts > 1 needs random starts; "
                         "fps_starts='centroid' defines exactly one")
    if key is None:
        key = jax.random.PRNGKey(0)
    # one shared bucket for the whole call: a little padding waste buys a
    # single compiled program per (bucket, pool) — compile time dominates
    # runtime on this backend
    shared = _bucket(max(len(p) for p in patches))
    groups: dict[int, list[int]] = {shared: list(range(len(patches)))}

    starts = None
    canon = None
    if torch_rng is not None:
        # draw in the reference's nested order, then regroup per model
        starts = np.zeros((len(models), len(patches), 2), np.int32)
        for pi, p in enumerate(patches):
            n = len(p)
            for mi, model in enumerate(models):
                m1_ref = int(math.ceil(model.pool * n))
                starts[mi, pi, 0] = torch_rng.randint(n)
                starts[mi, pi, 1] = torch_rng.randint(m1_ref)
        # reference-exact canonicalization (host-side, shared by all models:
        # the reference re-canonicalizes per model call but the input and
        # recipe are identical each time)
        canon = [_canon_reference(p) for p in patches]

    det_starts = centroid_starts(patches) if fps_starts == "centroid" else None

    n_votes = len(models) * vote_starts
    probs_per_vote = [[None] * len(patches) for _ in range(n_votes)]
    # Pad + upload each (bucket, chunk-width) batch ONCE and share the
    # device buffers across every model pass / vote of this call (the
    # buffers depend only on the patch data; without this the ensemble
    # re-uploads identical batches len(models) * vote_starts times).
    prepared_cache: dict = {}

    def _prepared_for(b, idxs, pool):
        from dipole_tpu.models.pointcnn import (_forward_width,
                                                prepare_patch_batches)

        n_dev = int(mesh.devices.size) if mesh is not None else 1
        width = _forward_width(b, pool) * n_dev
        ck = (b, width)
        if ck not in prepared_cache:
            prepared_cache[ck] = prepare_patch_batches(
                [np.asarray(patches[i], np.float32) for i in idxs],
                b, width, n_dev)
        return prepared_cache[ck]

    for mi, model in enumerate(models):
        mkey = _model_key(key, model, mi)
        for s in range(vote_starts):
            # s=0 uses mkey itself so vote_starts=1 reproduces the
            # single-start stream exactly; extra starts fold a constant
            # above the digest/bucket ranges (digests are 31-bit, buckets
            # small powers of two) so the streams cannot collide
            skey = (mkey if s == 0
                    else derive_keys_cpu(lambda put: jax.random.fold_in(
                        put(mkey), 0x9E3779B9 + s)))
            vi = mi * vote_starts + s
            for b, idxs in groups.items():
                gkey = derive_keys_cpu(
                    lambda put, sk=skey, bb=b: jax.random.fold_in(put(sk), bb))
                src = patches if canon is None else canon
                if starts is not None:
                    st = starts[mi][idxs]
                elif det_starts is not None:
                    st = det_starts[idxs]
                else:
                    st = None
                outs = pointcnn_logits_batched(
                    model.params, model.pool, [src[i] for i in idxs],
                    key=gkey, bucket=b, mesh=mesh,
                    starts=st,
                    precanon=canon is not None,
                    prepared=(None if canon is not None
                              else _prepared_for(b, idxs, model.pool)),
                )
                for i, logits in zip(idxs, outs):
                    probs_per_vote[vi][i] = _softmax(logits)[:, 1]
    results = []
    for i in range(len(patches)):
        results.append(voting_policy([probs_per_vote[v][i]
                                      for v in range(n_votes)]))
    return results
