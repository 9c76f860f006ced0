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


def _model_key(key, model, index: int):
    """Per-model PRNG key folded over a content digest of the checkpoint
    (not the model-list index), so --models ordering cannot move results.
    Falls back to the index for model objects without a digest."""
    import jax

    digest = getattr(model, "content_digest", None)
    return jax.random.fold_in(key, digest if digest is not None else index)


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


def ensemble_vote_patches(models, patches, key=None, mesh=None):
    """Ensemble-vote many ragged patches at once: patches are grouped into
    shared padded buckets and each model runs one vmapped forward per group
    (instead of len(models) * len(patches) sequential dispatches). Exact
    per-patch semantics are unchanged — each forward only ever reads its own
    patch. Returns a list of (flip_mask, probs) aligned with `patches`.
    mesh: optional Mesh — the patch batch is sharded over its devices."""
    import jax

    from dipole_tpu.models.pointcnn import _bucket, pointcnn_logits_batched

    patches = [np.asarray(p) for p in patches]
    if key is None:
        key = jax.random.PRNGKey(0)
    # one shared bucket for the whole call: a little padding waste buys a
    # single compiled program per (bucket, pool) — compile time dominates
    # runtime on this backend
    shared = _bucket(max(len(p) for p in patches))
    groups: dict[int, list[int]] = {shared: list(range(len(patches)))}

    probs_per_model = [[None] * len(patches) for _ in models]
    for mi, model in enumerate(models):
        mkey = _model_key(key, model, mi)
        for b, idxs in groups.items():
            gkey = jax.random.fold_in(mkey, b)
            outs = pointcnn_logits_batched(
                model.params, model.pool, [patches[i] for i in idxs], key=gkey,
                bucket=b, mesh=mesh,
            )
            for i, logits in zip(idxs, outs):
                probs_per_model[mi][i] = _softmax(logits)[:, 1]
    results = []
    for i in range(len(patches)):
        results.append(voting_policy([probs_per_model[m][i] for m in range(len(models))]))
    return results
