"""First-class in-memory orientation API.

The reference's programmatic surface (dipole_api.py:14-87) is a CLI facade:
arrays must round-trip through .xyz files on disk. This module is the
array-in / array-out equivalent of every pipeline — the CLIs in
`dipole_tpu.cli` are thin load/export wrappers around these functions, so
API and CLI behavior are one code path.

All functions take an (N, 3) or (N, 6) float array and return the oriented
(N, 6) array in the ORIGINAL coordinate space (normalization is internal).

    import dipole_tpu
    oriented = dipole_tpu.orient(points)                  # auto method
    oriented = dipole_tpu.api.orient_large(points, models=["hands.pt", ...])
"""
from __future__ import annotations

import numpy as np

from dipole_tpu.ops import fields, propagate
from dipole_tpu.ops.estimate import estimate_normals
from dipole_tpu.ops.patching import divide_pc, fix_n_filter
from dipole_tpu.models.inference import ensemble_vote_patches, load_model_from_file
from dipole_tpu.utils.io import Transform, orient_center_np
from dipole_tpu.utils.timing import timer_factory

__all__ = ["orient", "orient_simple", "orient_simple_batch", "orient_patches",
           "orient_large", "transfer_orientation", "MAX_PATCH_SIZE",
           "resolve_mesh", "stage_mesh", "AutoMesh"]

MAX_PATCH_SIZE = 500  # representatives per patch (reference orient_large.py:14)


class AutoMesh:
    """Marker for --mesh auto: the mesh is available, but each stage decides
    sharded vs single-chip from the measured decision table (stage_mesh)."""

    __slots__ = ("mesh",)

    def __init__(self, mesh):
        self.mesh = mesh

    def __repr__(self):
        return f"AutoMesh({self.mesh!r})"


def resolve_mesh(mesh):
    """Accept a Mesh, a device count (int), 'auto', or None.

    The CLIs/server pass the --mesh flag / DIPOLE_TPU_MESH env value here;
    programmatic callers can hand a prebuilt jax.sharding.Mesh directly.
    None and a count of <=1 mean single-device (mesh code paths bypassed).
    An explicit Mesh/count FORCES the sharded path everywhere; 'auto'
    returns an AutoMesh marker and each stage picks sharded vs single-chip
    per the measured decision table (stage_mesh)."""
    if mesh is None:
        return None
    from jax.sharding import Mesh

    if isinstance(mesh, (Mesh, AutoMesh)):
        m = mesh.mesh if isinstance(mesh, AutoMesh) else mesh
        return mesh if m.devices.size > 1 else None
    from dipole_tpu.parallel.sharding import make_mesh

    if isinstance(mesh, str):
        if mesh.strip().lower() in ("", "0", "none", "off"):
            return None
        if mesh.strip().lower() == "auto":
            m = make_mesh()
            return AutoMesh(m) if m.devices.size > 1 else None
        mesh = int(mesh)
    if isinstance(mesh, (int, np.integer)):
        if mesh <= 1:
            return None
        return make_mesh(int(mesh))
    raise ValueError(f"cannot resolve mesh from {mesh!r}")


# Single-chip point capacity of the sequential greedy (the streamed/XL
# Pallas chain; BASELINE.md large-N table + propagate_pallas.MAX_PALLAS_XL).
# Auto-mesh only reaches for the distributed loop past it — the loop's
# measured use-case is capacity, not speed (per-step cost RISES with device
# count: 1.31 -> 1.67 ms/step at D=2 -> 8 on the 8-way mesh).
def _greedy_single_chip_max() -> int:
    if fields._pallas_enabled():
        from dipole_tpu.ops import propagate_pallas

        return propagate_pallas.MAX_PALLAS_XL
    # no Pallas (CPU/debug): the XLA scan has O(N) state and no capacity
    # cliff; the distributed loop measured 45x slower at 2k on the CPU mesh
    return 2**62


def stage_mesh(mesh, stage: str, n: int | None = None):
    """Per-stage mesh selection for --mesh auto (VERDICT r3 item 6).

    Explicit meshes pass through unchanged (the user forced sharding).
    Under AutoMesh the measured decision table applies
    (tools/mesh_auto_bench.py on the 8-way virtual CPU mesh, 2026-08-18,
    + the round-3 large-N tables in BASELINE.md):

    | stage    | measurement                                | auto picks |
    |----------|--------------------------------------------|------------|
    | greedy   | 2k: 0.23 vs 10.2 s; 8k: 2.9 vs 7.5 s;      | single     |
    |          | per-step cost rises with device count      | chip up to |
    |          | (collective-bound sequential chain)        | capacity   |
    | patch    | 10k/8 patches: 2.7 vs 7.3 s                | single     |
    | replay   | 2k/T=3: 1.0 vs 7.5 s                       | single     |
    | sign_fix | 100k: 2.8 vs 4.0 s                         | single     |
    | ensemble | 16 patches: 3.9 vs 2.8 s (sharded wins)    | sharded    |
    | field    | 65k x 8k: 24.4 vs 17.5 s (sharded wins)    | sharded    |

    The sequential/cascade stages are collective-bound (4+ collectives per
    step); the embarrassingly-parallel stages scale. Capacity overrides
    speed: past the single-chip greedy ceiling the distributed loop is the
    only path, so auto switches to it there.

    PROVENANCE: the timing constants above were measured on the 8-way
    *virtual CPU* mesh (the only multi-device fabric available here), where
    host compute is slow relative to collectives. The single-chip rows are
    fabric-independent — the sequential chain pays 4+ collectives per step
    on any interconnect, so it only loses harder on real ICI — but the two
    "sharded wins" margins (ensemble 3.9→2.8 s, field 24.4→17.5 s) may
    widen or inverted-looking stages may flip on a real pod where compute
    is ~100× faster and ICI latency dominates. To re-derive on hardware:
    run `python tools/mesh_auto_bench.py <n_chips>` (with the CPU forcing
    lines removed) — its final block prints this exact table."""
    if mesh is None:
        return None
    if not isinstance(mesh, AutoMesh):
        return mesh
    if stage in ("ensemble", "field"):
        return mesh.mesh
    if stage == "greedy" and n is not None and n > _greedy_single_chip_max():
        return mesh.mesh
    return None


def _as_models(models):
    """Accept checkpoint paths or already-loaded PointCNNParams."""
    from dipole_tpu.models.pointcnn import PointCNNParams

    return [m if isinstance(m, PointCNNParams) else load_model_from_file(m)
            for m in (models or [])]


def _sign_fix(pc: np.ndarray, timer, mesh=None) -> np.ndarray:
    with timer("global sign fix"):
        if mesh is not None:
            from dipole_tpu.parallel.sharding import potential_sharded
            from dipole_tpu.utils.io import gen_grid

            mean = float(potential_sharded(pc, gen_grid(10), mesh).mean())
        else:
            mean = fields.measure_mean_potential(pc)
        if mean < 0:
            pc[:, 3:6] *= -1
    return pc


def orient_simple(points, diffuse: bool = False, estimate: bool = False,
                  n: int = 30, timer=None, mesh=None) -> np.ndarray:
    """Per-point strongest-field propagation (reference orient_simple.py:8-34):
    (estimate) -> normalize -> propagate -> lattice sign fix -> denormalize.
    mesh: optional Mesh / device count / 'auto' — the greedy accumulator and
    the sign-fix lattice shard over the devices (parallel.sharding)."""
    stage_timer = timer or timer_factory()
    mesh = resolve_mesh(mesh)
    input_pc = np.asarray(points, dtype=np.float32)

    if estimate or input_pc.shape[1] == 3:
        with stage_timer("estimate unoriented normals"):
            input_pc = estimate_normals(input_pc, max_nn=n)

    input_pc, transform = Transform.trans(input_pc)

    greedy_mesh = stage_mesh(mesh, "greedy", len(input_pc))
    if greedy_mesh is not None:
        from dipole_tpu.parallel.sharding import orient_points_multichip

        with stage_timer("dipole propagation (multichip)"):
            input_pc = orient_points_multichip(input_pc, greedy_mesh,
                                               diffuse=diffuse,
                                               starting_point=0)
        return transform.inverse(input_pc)

    with stage_timer("dipole propagation"):
        input_pc = propagate.strongest_field_propagation_points(
            input_pc, diffuse=diffuse, starting_point=0
        )

    input_pc = _sign_fix(input_pc, stage_timer)
    return transform.inverse(input_pc)


def orient_simple_batch(clouds, diffuse: bool = False, estimate: bool = False,
                        n: int = 30) -> list:
    """orient_simple for SEVERAL independent clouds in one device dispatch —
    the in-memory form of the server's micro-batching (serve/batching.py):
    the greedy orderings run as one vmapped scan and the lattice sign fixes
    as one vmapped field eval, so B clouds cost ~one cloud's sequential
    latency instead of B. Per-cloud results are independent of the batch
    (each vmapped lane reads only its own cloud); a single-cloud call
    delegates to orient_simple. Returns a list of (N_i, 6) arrays in
    original coordinates."""
    clouds = [np.asarray(c, dtype=np.float32) for c in clouds]
    if not clouds:
        return []
    if len(clouds) == 1:
        return [orient_simple(clouds[0], diffuse=diffuse, estimate=estimate,
                              n=n)]
    prepped, transforms = [], []
    for pc in clouds:
        if estimate or pc.shape[1] == 3:
            pc = estimate_normals(pc, max_nn=n)
        pc, tr = Transform.trans(pc)
        prepped.append(pc)
        transforms.append(tr)
    oriented = propagate.orient_clouds_batched(prepped, diffuse=diffuse)
    return [tr.inverse(o) for o, tr in zip(oriented, transforms)]


def orient_patches(points, models=(), iters: int = 100,
                   propagation_iters: int = 10, number_parts: int = 15,
                   minimum_points_per_patch: int = 21,
                   curvature_threshold: float = 0.0, diffuse: bool = False,
                   weighted_prop: bool = False, estimate: bool = False,
                   n: int = 30, timer=None, mesh=None,
                   torch_rng: int | None = None,
                   vote_starts: int = 1,
                   fps_starts: str = "rng",
                   vote_margin: float = 0.0,
                   fix_models=(), fix_margin: float = 0.25,
                   fix_when: str = "last",
                   fix_vote: str = "all",
                   fix_stats: dict | None = None,
                   vote_seed: int = 1) -> np.ndarray:
    """Patch pipeline with PointCNN ensemble correction (reference
    orient_pointcloud.py:11-83): voxel patches -> curvature filter ->
    orient_center -> iterate {ensemble votes, periodic patch propagation} ->
    final propagation -> lattice sign fix. mesh: optional Mesh / device
    count / 'auto' — the ensemble forward batch and the patch-interaction
    pair work shard over the devices (results unchanged).

    torch_rng: optional int seed — replay the torch reference's FPS-start
    randomness bit-exactly (the reference pins torch.manual_seed(1),
    orient_pointcloud.py:8; pass 1 to reproduce its runs). One MT19937
    stream is consumed across all iterations in the reference's order.

    vote_starts: FPS-start ensembling — each model votes this many times
    with independent FPS starts (models/inference.ensemble_vote_patches);
    1 = reference semantics.

    fps_starts: 'rng' (reference semantics) or 'centroid' — deterministic
    patch-centroid-nearest FPS starts (pointcnn.centroid_starts), removing
    start noise from the ensemble entirely.

    vote_margin: flip a point only when the ensemble's mean P(flip)
    clears 0.5 by this margin (flip where p < 0.5 - margin). 0.0 is the
    reference vote (inference_utils.py:47-49); >0 trades vote recall for
    precision — low-confidence flips are suppressed, which protects
    well-initialized patches from noisy votes.

    fix_models / fix_margin: STAGED vote — a second, per-point fix pass
    after each gauge vote. Motivation (measured, BASELINE.md round-4/5
    training sections): checkpoint families divide the labor — gauge
    voters pick keep-all/flip-all per patch very well but never fix
    points inside a patch (fix rate 0.000), while gauge-free-trained
    fixers repair coherent minority regions (fix rates 0.25-0.35) but
    are weak gauge pickers; pooling both into ONE mean-probability vote
    (inference_utils.py:47-49 semantics) lets fixer confidence swing
    whole-patch gauges and craters accuracy (measured ok 0.9717 -> 0.8906).
    The staged pass keeps the duties separate: `models` own the patch
    gauge exactly as before; `fix_models` then flip only points whose
    P(flip) clears 0.5 by fix_margin, and only when the flip set is
    a strict minority of the patch (a majority flip is a gauge claim,
    which stage 1 owns — it is discarded). Empty fix_models is exactly
    the unstaged pipeline.

    fix_when: 'last' (default) runs the fix pass ONCE, after the vote
    loop and before the final propagation — the e2e loss localization
    (tools/e2e_patch_diagnostic.py, 2026-08-19) shows the converged
    pipeline's residue is per-point regions with ZERO gauge-flipped
    patches, i.e. one post-cascade repair is the matched intervention;
    'every' repeats the pass each iteration (measured: false flips
    compound across the 10-iteration loop — ok 0.9754 -> 0.9475).
    fix_vote: 'all' flips only points EVERY fixer clears the margin on
    (unanimity — precision over recall; the loop has no second chance
    to undo a false flip under 'last'); 'mean' uses the reference-style
    mean probability (inference_utils.py:47-49 semantics).

    fix_stats: optional dict — each fix pass appends to fix_stats
    ['passes'] a list of per-patch records (pidx, per-model probs,
    combined probs, flip mask, guarded flag) for offline analysis
    (tools/fixer_probe.py). Pure instrumentation, results unchanged.

    vote_seed: base PRNG seed of the ensemble vote stream. 1 (the
    reference's pinned torch.manual_seed, orient_pointcloud.py:8) is the
    default and reproduces every previously published number; other
    seeds yield statistically equivalent but decorrelated runs — the
    vote cascade is measurably chaotic, so consensus over several seeds
    (api.orient_patches_consensus) averages the cascade noise out."""
    import jax

    if torch_rng is not None and int(vote_starts) != 1:
        raise ValueError("vote_starts > 1 is incompatible with torch_rng "
                         "replay (one start per model by definition)")
    if torch_rng is not None and fps_starts != "rng":
        raise ValueError("fps_starts='centroid' is incompatible with "
                         "torch_rng replay (the replayed stream defines "
                         "the starts)")
    stage_timer = timer or timer_factory()
    mesh = resolve_mesh(mesh)
    rng_stream = None
    if torch_rng is not None:
        from dipole_tpu.utils.torch_rng import TorchMT19937

        rng_stream = TorchMT19937(int(torch_rng))
    pc = np.asarray(points, dtype=np.float32)
    if estimate or pc.shape[1] == 3:
        with stage_timer("estimate unoriented normals"):
            pc = estimate_normals(pc, max_nn=n)
    input_pc, transform = Transform.trans(pc)

    models = _as_models(models)
    fix_models = _as_models(fix_models)

    with stage_timer("voxel patching"):
        all_patches = divide_pc(input_pc[:, :3], number_parts,
                                min_patch=minimum_points_per_patch)

    with stage_timer("curvature filter"):
        patch_indices = fix_n_filter(input_pc, all_patches, curvature_threshold)

    print(f"number of patches {len(patch_indices)}")

    with stage_timer("centroid init"):
        for _, p in patch_indices:
            input_pc[p] = orient_center_np(input_pc[p])

    pc_probs = np.ones(len(input_pc), dtype=np.float32)
    from dipole_tpu.models.pointcnn import derive_keys_cpu

    key = derive_keys_cpu(lambda put: jax.random.PRNGKey(int(vote_seed)))

    def propagate_now():
        return propagate.strongest_field_propagation_patches(
            input_pc, patch_indices, all_patches, diffuse=diffuse,
            weights=pc_probs if weighted_prop else None,
            mesh=stage_mesh(mesh, "patch", len(input_pc)),
        )

    if fix_when not in ("last", "every"):
        raise ValueError(f"fix_when must be 'last' or 'every', "
                         f"got {fix_when!r}")
    if fix_vote not in ("all", "mean"):
        raise ValueError(f"fix_vote must be 'all' or 'mean', "
                         f"got {fix_vote!r}")

    def _fix_pass():
        # staged per-point fix pass on the gauge-corrected patches (see
        # docstring); keyed independently of the gauge stream
        nonlocal key
        if not (fix_models and patch_indices):
            return
        key, sub = derive_keys_cpu(lambda put: jax.random.split(put(key)))
        patches_now = [input_pc[pidx] for _, pidx in patch_indices]
        fmesh = stage_mesh(mesh, "ensemble")
        if fix_vote == "all":
            # unanimity: every fixer must clear the margin on its own
            per_model = [ensemble_vote_patches(
                [m], patches_now, key=sub, mesh=fmesh,
                fps_starts=fps_starts) for m in fix_models]
            probs_by_model = [[pm[i][1] for pm in per_model]
                              for i in range(len(patches_now))]
            plist = [np.max(ps, axis=0) for ps in probs_by_model]
        else:
            plist = [p for _f, p in ensemble_vote_patches(
                fix_models, patches_now, key=sub, mesh=fmesh,
                fps_starts=fps_starts)]
            probs_by_model = [[p] for p in plist]
        records = []
        for i, ((_, pidx), probs) in enumerate(zip(patch_indices, plist)):
            flip = probs < (0.5 - fix_margin)
            guarded = bool(flip.mean() >= 0.5)
            if fix_stats is not None:
                records.append(dict(
                    pidx=pidx, probs_by_model=probs_by_model[i],
                    normals=patches_now[i][:, 3:6].copy(),
                    probs=probs, flip=flip, guarded=guarded))
            if guarded:
                continue  # majority flip = gauge claim, stage 1 owns
            pc_probs[pidx[flip]] = 1 - probs[flip]
            input_pc[pidx[flip], 3:6] *= -1
        if fix_stats is not None:
            fix_stats.setdefault("passes", []).append(records)

    for it in range(iters):
        with stage_timer(f"iteration {it}"):
            if models and patch_indices:
                # one batched ensemble pass over all filtered patches (each
                # forward reads only its own patch, so this is exactly the
                # reference's sequential per-patch loop)
                key, sub = derive_keys_cpu(
                    lambda put: jax.random.split(put(key)))
                votes = ensemble_vote_patches(
                    models, [input_pc[pidx] for _, pidx in patch_indices],
                    key=sub, mesh=stage_mesh(mesh, "ensemble"),
                    torch_rng=rng_stream,
                    vote_starts=vote_starts,
                    fps_starts=fps_starts,
                )
                for (_, pidx), (flip, probs) in zip(patch_indices, votes):
                    if vote_margin:
                        flip = probs < (0.5 - vote_margin)
                    probs = probs.copy()
                    probs[flip] = 1 - probs[flip]
                    pc_probs[pidx] = probs
                    input_pc[pidx[flip], 3:6] *= -1

            if fix_when == "every":
                _fix_pass()

            if it % propagation_iters == 0 and (it != 0 or propagation_iters == 1):
                with stage_timer("patch propagation"):
                    input_pc = propagate_now()

    if fix_when == "last":
        with stage_timer("fix pass"):
            _fix_pass()

    with stage_timer("patch propagation"):
        input_pc = propagate_now()

    input_pc = _sign_fix(input_pc, stage_timer,
                         mesh=stage_mesh(mesh, "sign_fix"))
    return transform.inverse(input_pc)


def orient_patches_consensus(points, models=(), runs: int = 3,
                             vote_seeds=None, **kwargs) -> np.ndarray:
    """Consensus-of-runs: run orient_patches with `runs` decorrelated vote
    streams (vote_seed = 1..runs by default) and majority-vote each
    point's final sign.

    Why this works: the vote/propagation cascade is measurably chaotic —
    the same ensemble lands percents apart under different FPS-start
    streams (BASELINE round-3 start-noise table) or backends (0.9536 vs
    0.7990 measured on one pair) — so a single run's residual errors are
    partly run-specific. Majority over an odd number of decorrelated runs
    keeps each point's most common sign, which recovers points that only
    a minority of runs get wrong. Deterministic (fixed seed set), and
    vote_seeds=[1] is exactly one reference-semantics run. Cost: runs x
    one pipeline; the runs share every compiled program."""
    if vote_seeds is None:
        vote_seeds = list(range(1, int(runs) + 1))
    outs = [orient_patches(points, models=models, vote_seed=s, **kwargs)
            for s in vote_seeds]
    base = outs[0].copy()
    votes = np.zeros(len(base), np.int64)
    for o in outs:
        s = np.where((o[:, 3:6] * base[:, 3:6]).sum(-1) >= 0, 1, -1)
        # align the run's global gauge to the anchor first: the lattice
        # sign fix picks the same orientation in practice, but a run that
        # landed in the opposite gauge must not vote inverted
        votes += s * (1 if s.sum() >= 0 else -1)
    base[votes < 0, 3:6] *= -1
    return base


def orient_large(points, models=(), iters: int = 100, number_parts: int = 15,
                 minimum_points_per_patch: int = 21,
                 curvature_threshold: float = 0.0, estimate: bool = False,
                 n: int = 30, seed: int = 1, timer=None, mesh=None,
                 vote_starts: int = 1, fps_starts: str = "rng",
                 vote_margin: float = 0.0,
                 fix_models=(), fix_margin: float = 0.25,
                 fix_when: str = "last", fix_vote: str = "all",
                 vote_seed: int = 1) -> np.ndarray:
    """Large clouds via <=500 representative points per patch (reference
    orient_large.py:10-90). NOTE pipeline-order parity: normals are estimated
    AFTER normalization here (the reference does the same only in this
    pipeline, orient_large.py:17-24). mesh: optional Mesh / device count /
    'auto' — ensemble forwards, the rep-interaction matrix and the rest-point
    field pass shard over the devices (results unchanged).
    vote_starts: FPS-start ensembling; vote_margin: confidence-gated flips;
    fix_models/fix_margin/fix_when/fix_vote: staged per-point fix pass on
    the representative sets (see orient_patches)."""
    import jax

    stage_timer = timer or timer_factory()
    mesh = resolve_mesh(mesh)
    input_pc = np.asarray(points, dtype=np.float32)
    input_pc, transform = Transform.trans(input_pc)

    if estimate or input_pc.shape[1] == 3:
        with stage_timer("estimate unoriented normals"):
            input_pc = estimate_normals(input_pc, max_nn=n)

    models = _as_models(models)
    fix_models = _as_models(fix_models)

    with stage_timer("voxel patching"):
        all_patches = divide_pc(input_pc[:, :3], number_parts,
                                min_patch=minimum_points_per_patch)

    with stage_timer("curvature filter"):
        patch_indices = fix_n_filter(input_pc, all_patches, curvature_threshold)

    print(f"number of patches {len(patch_indices)}/{len(all_patches)}")

    with stage_timer("centroid init"):
        for _, p in patch_indices:
            input_pc[p] = orient_center_np(input_pc[p])

    with stage_timer("pick representatives"):
        rng = np.random.default_rng(seed)
        represent = []
        for p in all_patches:
            perm = rng.permutation(len(p))
            represent.append((p[perm[:MAX_PATCH_SIZE]], p[perm[MAX_PATCH_SIZE:]]))

    pc_probs = np.ones(len(input_pc), dtype=np.float32)
    from dipole_tpu.models.pointcnn import derive_keys_cpu

    key = derive_keys_cpu(lambda put: jax.random.PRNGKey(int(vote_seed)))

    if fix_when not in ("last", "every"):
        raise ValueError(f"fix_when must be 'last' or 'every', "
                         f"got {fix_when!r}")
    if fix_vote not in ("all", "mean"):
        raise ValueError(f"fix_vote must be 'all' or 'mean', "
                         f"got {fix_vote!r}")

    with stage_timer("network correction"):
        rep_sets = [represent[i][0] for i, _ in patch_indices] if models else []

        def _fix_pass():
            # staged per-point fix pass (see orient_patches docstring)
            nonlocal key
            if not (fix_models and rep_sets):
                return
            key, sub = derive_keys_cpu(
                lambda put: jax.random.split(put(key)))
            patches_now = [input_pc[r] for r in rep_sets]
            fmesh = stage_mesh(mesh, "ensemble")
            if fix_vote == "all":
                per_model = [ensemble_vote_patches(
                    [m], patches_now, key=sub, mesh=fmesh,
                    fps_starts=fps_starts) for m in fix_models]
                plist = [np.max([pm[i][1] for pm in per_model], axis=0)
                         for i in range(len(patches_now))]
            else:
                plist = [p for _f, p in ensemble_vote_patches(
                    fix_models, patches_now, key=sub, mesh=fmesh,
                    fps_starts=fps_starts)]
            for reps, probs in zip(rep_sets, plist):
                flip = probs < (0.5 - fix_margin)
                if flip.mean() >= 0.5:
                    continue
                pc_probs[reps[flip]] = 1 - probs[flip]
                input_pc[reps[flip], 3:6] *= -1

        # the reference runs iters sequential re-votes per patch; the patches
        # are independent, so each round is one batched ensemble pass
        for _ in range(iters if rep_sets else 0):
            key, sub = derive_keys_cpu(
                lambda put: jax.random.split(put(key)))
            votes = ensemble_vote_patches(
                models, [input_pc[r] for r in rep_sets], key=sub,
                mesh=stage_mesh(mesh, "ensemble"),
                vote_starts=vote_starts,
                fps_starts=fps_starts,
            )
            for reps, (flip, probs) in zip(rep_sets, votes):
                if vote_margin:
                    flip = probs < (0.5 - vote_margin)
                pc_probs[reps] = probs
                input_pc[reps[flip], 3:6] *= -1
            if fix_when == "every":
                _fix_pass()
        if fix_when == "last":
            _fix_pass()

    with stage_timer("dipole propagation"):
        input_pc = propagate.strongest_field_propagation_reps(
            input_pc, represent, diffuse=True,
            mesh=stage_mesh(mesh, "patch", len(input_pc))
        )

    input_pc = _sign_fix(input_pc, stage_timer,
                         mesh=stage_mesh(mesh, "sign_fix"))
    return transform.inverse(input_pc)


def transfer_orientation(reference_pc, target, estimate: bool = False,
                         n: int = 30) -> np.ndarray:
    """Orient `target` by the dipole field of an oriented reference cloud
    (reference reference_orientation.py:8-28): 3-col targets take the
    normalized field as their normal; 6-col targets only take its sign.
    No normalization, no sign fix — parity with the reference."""
    reference_pc = np.asarray(reference_pc, dtype=np.float32)
    target = np.asarray(target, dtype=np.float32)
    if estimate:
        target = estimate_normals(target, max_nn=n)
    return np.asarray(fields.reference_field(reference_pc, target))


def orient(points, method: str = "auto", models=(), **kwargs) -> np.ndarray:
    """One-call orientation. method: 'auto' | 'simple' | 'patches' | 'large'
    | 'xie' | 'tree_xie' | 'hoppe'. 'auto' picks 'simple' for small clouds
    without models, 'patches' for small clouds with models, 'large' above
    50k points. xie/tree_xie/hoppe accept the server protocol's config keys
    (serve/handlers.py) as kwargs; per server-protocol semantics these three
    take xyz only — caller-supplied normal columns are ignored and normals
    are re-estimated."""
    points = np.asarray(points)
    if method == "auto":
        if len(points) > 50_000:
            method = "large"
        else:
            method = "patches" if models else "simple"
    if method == "simple":
        return orient_simple(points, **kwargs)
    if method == "patches":
        return orient_patches(points, models=models, **kwargs)
    if method == "large":
        return orient_large(points, models=models, **kwargs)
    if method in ("xie", "tree_xie", "hoppe"):
        from dipole_tpu.serve import handlers

        name = {"xie": "xie_propagation", "tree_xie": "tree_xie_propagation",
                "hoppe": "hoppe_estimate"}[method]
        if method == "hoppe":
            # hoppe_estimate reads k_neighbor/r, not max_nn (serve/handlers.py)
            config = {"k_neighbor": kwargs.pop("n", 10), **kwargs}
        else:
            config = {"max_nn": kwargs.pop("n", 30), "eps": 1.0,
                      "diffuse": False, "times": 3, **kwargs}
        out = handlers.dispatch(name, points[:, :3], config)
        return np.asarray(out, dtype=np.float32)  # same dtype as the other methods
    raise ValueError(f"unknown method {method!r}")
