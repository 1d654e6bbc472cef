"""pyprogressivex-compatible Python API.

Function names, keyword names, defaults, return shapes and the labeling
convention mirror the reference bindings
(`/root/reference/src/pyprogressivex/src/bindings.cpp:410-491`):

  findLines(points, weights, w, h, ...)            -> ([K,3], labeling)
  findVanishingPoints(lines, weights, w, h, ...)   -> ([K,3], labeling)
  findHomographies(corrs, w1, h1, w2, h2, ...)     -> ([3K,3], labeling)
  findTwoViewMotions(corrs, w1, h1, w2, h2, ...)   -> ([3K,3], labeling)
  find6DPoses(x1y1, x2y2z2, K, ...)                -> ([3K,4], labeling)

labeling[i] in {0..K-1} names the model instance, K means outlier
(reference `progressive_x.h:375-385` + PEARL labels).

Sampler ids follow the reference front ends
(`progressivex_python.cpp:215-245`): 0 uniform, 1 PROSAC, 2 P-NAPSAC,
3 NAPSAC (for findLines the reference numbers NAPSAC as 2,
`progressivex_python.cpp:474-476` — both 2 and 3 map to NAPSAC here;
vanishing points accept 0/1 only and fall back to uniform, matching
`progressivex_python.cpp:353-366`).

`max_iters` (the reference's per-proposal RANSAC iteration cap,
`progressivex_python.cpp:271`) sets the batched hypothesis budget: one
proposal round draws min(max_iters, per-family cap — see
`_MAX_HYP_BY_FAMILY`) minimal samples. By DEFAULT exactly one such
sub-batch is drawn per round — a measured-better deviation from the
literal reference semantics (see `_MAX_SUBBATCHES` for the numbers);
setting PROGX_MAX_SUBBATCHES>1 draws further sub-batches until the RANSAC
k* confidence criterion is met or the full max_iters budget is exhausted
(engine._proposal) — the literal batched form of the reference's adaptive
sequential search.

Extra keyword (extension): `random_seed` — the engine is deterministic
given a seed; the reference uses an unseeded std RNG.
"""

from __future__ import annotations

import dataclasses
import functools
import time

import numpy as np

import jax
import jax.numpy as jnp

from progressivex_tpu.core.config import EngineConfig, make_params
from progressivex_tpu.core import engine
from progressivex_tpu.models import get_family

_PAD = 128  # pad point counts to a lane-width multiple
_MAX_HYP = 2048
# The flattened hypothesis axis (n_hypotheses * family.max_solutions) is
# additionally capped: programs with a >4096 hypothesis axis reliably
# SIGABRT the TPU compiler (empirical boundary between 4096 and 4608).
_MAX_HYP_FLAT = 4096
_UNLIMITED = 10**9


@dataclasses.dataclass
class Statistics:
    """Run statistics — the counterpart of the reference's
    MultiModelStatistics + per-iteration IterationStatistics
    (`progressive_x.h:75-104`). Pass `with_statistics=True` to any find*
    function to receive one.

    `iterations` holds one record per executed round with the round's
    algorithmic quantities (proposal support/tanimoto/score, PEARL energy,
    live instance count). The reference's per-phase wall-clock fields have
    no analog inside a single fused XLA program — phases overlap and fuse —
    but passing `with_statistics="phases"` additionally runs the compiled
    program ONCE under jax.profiler and fills `phase_times` with the
    device-time rollup by engine phase tag (proposal / sampling / graph /
    labeling / refit / other; see io/profiling.py for the attribution
    caveats). `phase_times` stays None with plain `with_statistics=True`
    or when the backend yields no profiler trace.
    """

    processing_time: float
    rounds_run: int
    ransac_iterations: int
    model_number: int
    labeling: "np.ndarray"
    inliers_of_each_model: list
    iterations: list = dataclasses.field(default_factory=list)
    phase_times: dict | None = None


# Point counts pad up to one of these levels (~x1.5 apart, multiples of
# 128) rather than to every 128-multiple: a dataset sweep then compiles
# one program per LEVEL touched (AdelaideRMF-H: 5 instead of ~12), and
# the eval harness's scene buckets (eval/adelaide._BUCKETS) share the
# same levels. Sizes beyond the table fall back to 128-multiples.
PAD_LEVELS = (128, 256, 384, 512, 768, 1024, 1536, 2304, 3456, 5120, 7680)


def _pad_to(n: int) -> int:
    for level in PAD_LEVELS:
        if n <= level:
            return level
    return -(-n // _PAD) * _PAD


# Per-family batched-budget caps. Measured on AdelaideRMF (unihouse, the
# 6-structure scene): homography proposal batches beyond ~512 are both
# SLOWER and WORSE (mean ME 0.17 at 1000 vs 0.14 at 512) — one huge batch
# over-selects the single globally-highest-scoring hypothesis, which in a
# multi-structure scene tends to be a greedy bridge model, while a smaller
# batch discovers structures more sequentially (closer to the reference's
# adaptive search, which at confidence 0.5 stops after tens-to-hundreds of
# iterations anyway).
# Fundamental caps at 512 for a different reason: per single run the
# 7-point pipeline PREFERS the bigger pool (mean ME 0.035 at 1365 vs
# 0.046 at 512), but its front-end DEFAULT is n_restarts=4
# (findTwoViewMotions; measured round 3 — the 5th restart bought nothing),
# and energy-selected restarts x 512 samples strictly dominate 3 x 1365
# (mean ME 0.032 vs 0.046 at equal device time) — restart diversity buys
# more than pool depth. A user forcing n_restarts=1 gives up a little
# single-roll quality.
# (Homography re-measured at 256: unihouse ME 0.121 vs 0.135 at 512 and
# 0.17 at 1000, small scenes unchanged at 0.015 — the trend holds, so the
# cap is 256; line/VP keep 512, untested lower.)
_MAX_HYP_BY_FAMILY = {"homography": 256, "line2d": 512,
                      "vanishing_point": 512, "fundamental": 512}


def _hyp_budget(max_iters: int, max_solutions: int = 1,
                family_name: str | None = None) -> int:
    cap = _MAX_HYP_BY_FAMILY.get(family_name, _MAX_HYP)
    return int(min(max(int(max_iters), 64), cap,
                   _MAX_HYP_FLAT // max(max_solutions, 1)))


# Upper bound on adaptive proposal sub-batches per round. The per-family
# caps above bound the SUB-BATCH size (the measured selection/HBM sweet
# spots); the requested max_iters budget is honored by drawing up to
# ceil(max_iters / sub_batch) sub-batches with the k* confidence stop
# (engine._proposal) — e.g. the reference F protocol's max_iters=10000
# buys additional sub-batches whenever the search has not yet found a
# confident model, instead of being silently capped at 512.
# The DEFAULT cap is 1, a measured-optimal policy, not a silent
# limitation: on the bundled AdelaideRMF-F protocol (32 lanes x 5
# restarts x 3 fresh-seed runs, sigma-marginalized ranking) the deeper
# budgets the protocol nominally requests are strictly WORSE on the
# reference's own metric and clock —
#   1 sub-batch  (512/round):   mean ME 0.0245, worst run 0.08, 674 ms
#   4 sub-batches (2048/round): mean ME 0.0297, worst run 0.32, 1464 ms
#   20 sub-batches (10240/rnd): mean ME 0.0350, worst run 0.53, 5776 ms
# — a larger pool re-admits high-raw-support bridge hypotheses that the
# penalized score imperfectly filters (the round-1 >512-batch finding),
# and every no-new-structure confirmation round burns the entire budget
# by construction (k* of a small candidate structure exceeds any
# affordable count) with a vmapped batch paying the slowest lane.
# Users who want the literal requested depth pass `max_subbatches=` on
# findHomographies / findTwoViewMotions (or set PROGX_MAX_SUBBATCHES to
# change the default for every front end); the adaptive k* machinery
# honors it (engine._proposal).
_MAX_SUBBATCHES = int(__import__("os").environ.get(
    "PROGX_MAX_SUBBATCHES", "1"))


def _n_subbatches(max_iters: int, n_hyp: int, cap: int | None = None) -> int:
    cap = _MAX_SUBBATCHES if cap is None else int(cap)
    return int(min(max(-(-int(max_iters) // max(n_hyp, 1)), 1), max(cap, 1)))


@functools.lru_cache(maxsize=64)
def _compiled_fit(family_name: str, cfg: EngineConfig, n_pad: int, has_graph: bool):
    family = get_family(family_name)

    def run(data, mask, weights, key, params, graph_data):
        gd = graph_data if has_graph else None
        return engine.fit(family, cfg, params, data, mask, weights, key, gd)

    return jax.jit(run)


def _run(
    family_name,
    data,
    weights,
    *,
    threshold,
    conf,
    spatial_coherence_weight,
    neighborhood_ball_radius,
    maximum_tanimoto_similarity,
    max_iters,
    minimum_point_number,
    maximum_model_number,
    sampler_id,
    scoring_exponent,
    do_logging=False,
    random_seed=0,
    graph_data=None,
    with_statistics=False,
    lo_spatial_lambda=0.5,
    n_restarts=1,
    final_polish=0,
    final_relabel=0,
    magsac_levels=0,
    split_pass=0,
    polish_trim=0.0,
    polish_research=0,
    restart_rule="energy",
    max_rounds=10,
    pearl_iters=3,
    max_subbatches=None,
    progress_callback=None,
):
    t0 = time.perf_counter()
    data = np.ascontiguousarray(data, np.float32)
    n = data.shape[0]
    n_pad = _pad_to(n)

    pad = ((0, n_pad - n), (0, 0))
    data_p = np.pad(data, pad)
    mask = np.zeros((n_pad,), bool)
    mask[:n] = True
    w = np.ones((n_pad,), np.float32)
    if weights is not None and np.size(weights) > 0:
        w[:n] = np.asarray(weights, np.float32).reshape(-1)[:n]
    w[n:] = 0.0
    graph_p = None
    if graph_data is not None:
        graph_p = np.pad(np.ascontiguousarray(graph_data, np.float32), pad)

    n_hyp = _hyp_budget(
        max_iters, get_family(family_name).max_solutions, family_name
    )
    cfg = EngineConfig(
        family=family_name,
        n_hypotheses=n_hyp,
        n_subbatches=_n_subbatches(max_iters, n_hyp, max_subbatches),
        sampler_id=int(sampler_id),
        lo_spatial_lambda=lo_spatial_lambda,
        n_restarts=int(n_restarts),
        final_polish=int(final_polish),
        final_relabel=int(final_relabel),
        magsac_levels=int(magsac_levels),
        split_pass=int(split_pass),
        polish_trim=float(polish_trim),
        polish_research=int(polish_research),
        restart_rule=str(restart_rule),
        max_rounds=int(max_rounds),
        pearl_iters=int(pearl_iters),
        live_progress=progress_callback is not None,
    )
    params = make_params(
        threshold=threshold,
        confidence=conf,
        spatial_weight=spatial_coherence_weight,
        neighborhood_radius=neighborhood_ball_radius,
        max_tanimoto=maximum_tanimoto_similarity,
        min_inliers=minimum_point_number,
        max_models=maximum_model_number if maximum_model_number > 0 else _UNLIMITED,
        scoring_exponent=scoring_exponent,
        n_valid=n,
    )
    fit_fn = _compiled_fit(family_name, cfg, n_pad, graph_p is not None)
    key = jax.random.PRNGKey(int(random_seed))
    # The compiled program embeds only the trampoline; the actual consumer
    # is looked up per call through engine.LIVE_CALLBACK, so one compile
    # serves every callback (and the cache key stays cfg-only).
    engine.LIVE_CALLBACK = progress_callback
    try:
        result = fit_fn(
            jnp.asarray(data_p), jnp.asarray(mask), jnp.asarray(w), key,
            params,
            jnp.asarray(graph_p) if graph_p is not None
            else jnp.zeros_like(data_p),
        )
        descs, labels = engine.compact_result(
            jax.tree.map(np.asarray, result), n
        )
    finally:
        engine.LIVE_CALLBACK = None
    processing_time = time.perf_counter() - t0
    if do_logging:
        print(
            f"[progressivex_tpu] {family_name}: {descs.shape[0]} instances, "
            f"{int(result.rounds_run)} rounds, "
            f"{int(result.total_iters)} samples, "
            f"{processing_time:.3f}s"
        )
    stats = None
    if with_statistics:
        k = descs.shape[0]
        rl = result.round_log
        iterations = [
            {
                "accepted": bool(rl.accepted[r]),
                "proposal_inliers": int(rl.inliers[r]),
                "tanimoto": float(rl.tanimoto[r]),
                "proposal_score": float(rl.score[r]),
                "pearl_energy": float(rl.energy[r]),
                "active_models": int(rl.n_active[r]),
            }
            for r in range(int(result.rounds_run))
        ]
        phase_times = None
        if isinstance(with_statistics, str) and "phase" in with_statistics:
            from progressivex_tpu.io.profiling import measure_phase_times

            args = (jnp.asarray(data_p), jnp.asarray(mask), jnp.asarray(w),
                    key, params,
                    jnp.asarray(graph_p) if graph_p is not None
                    else jnp.zeros_like(data_p))
            phase_times = measure_phase_times(
                lambda: jax.block_until_ready(fit_fn(*args)))
        stats = Statistics(
            processing_time=processing_time,
            rounds_run=int(result.rounds_run),
            ransac_iterations=int(result.total_iters),
            model_number=k,
            labeling=labels,
            inliers_of_each_model=[
                np.flatnonzero(labels == i) for i in range(k)
            ],
            iterations=iterations,
            phase_times=phase_times,
        )
    return descs, labels, stats


def findLines(
    points,
    weights=None,
    w=0,
    h=0,
    threshold=2.0,
    conf=0.5,
    spatial_coherence_weight=0.0,
    neighborhood_ball_radius=200.0,
    maximum_tanimoto_similarity=0.4,
    max_iters=1000,
    minimum_point_number=10,
    maximum_model_number=-1,
    sampler_id=3,
    scoring_exponent=2,
    do_logging=False,
    random_seed=0,
    with_statistics=False,
    n_restarts=1,
    progress_callback=None,
):
    """Multi 2D-line fitting. points: [N,2]. Returns ([K,3] (a,b,c), labeling)."""
    points = np.asarray(points, np.float64)
    if points.ndim != 2 or points.shape[1] != 2 or points.shape[0] < 2:
        raise ValueError("points should be an array with dims [n,2], n>=2")
    sid = {0: 0, 1: 1, 2: 3, 3: 3}.get(int(sampler_id), 0)
    descs, labels, stats = _run(
        "line2d", points, weights,
        threshold=threshold, conf=conf,
        spatial_coherence_weight=spatial_coherence_weight,
        neighborhood_ball_radius=neighborhood_ball_radius,
        maximum_tanimoto_similarity=maximum_tanimoto_similarity,
        max_iters=max_iters, minimum_point_number=minimum_point_number,
        maximum_model_number=maximum_model_number, sampler_id=sid,
        scoring_exponent=scoring_exponent, do_logging=do_logging,
        random_seed=random_seed, with_statistics=with_statistics,
        n_restarts=n_restarts, progress_callback=progress_callback,
    )
    out = descs.astype(np.float64)
    return (out, labels, stats) if with_statistics else (out, labels)


def findVanishingPoints(
    lines,
    weights=None,
    w=0,
    h=0,
    threshold=4.0,
    conf=0.5,
    spatial_coherence_weight=0.0,
    neighborhood_ball_radius=200.0,
    maximum_tanimoto_similarity=0.4,
    max_iters=1000,
    minimum_point_number=10,
    maximum_model_number=-1,
    sampler_id=3,
    scoring_exponent=2,
    do_logging=False,
    random_seed=0,
    with_statistics=False,
    n_restarts=1,
    progress_callback=None,
):
    """Multi vanishing-point fitting. lines: [N,4] segments [xs,ys,xe,ye].
    Returns ([K,3] unit homogeneous VPs, labeling)."""
    lines = np.asarray(lines, np.float64)
    if lines.ndim != 2 or lines.shape[1] != 4 or lines.shape[0] < 2:
        raise ValueError("lines should be an array with dims [n,4], n>=2")
    sid = int(sampler_id) if int(sampler_id) in (0, 1) else 0
    descs, labels, stats = _run(
        "vanishing_point", lines, weights,
        threshold=threshold, conf=conf,
        spatial_coherence_weight=spatial_coherence_weight,
        neighborhood_ball_radius=neighborhood_ball_radius,
        maximum_tanimoto_similarity=maximum_tanimoto_similarity,
        max_iters=max_iters, minimum_point_number=minimum_point_number,
        maximum_model_number=maximum_model_number, sampler_id=sid,
        scoring_exponent=scoring_exponent, do_logging=do_logging,
        random_seed=random_seed, with_statistics=with_statistics,
        n_restarts=n_restarts, progress_callback=progress_callback,
    )
    out = descs.astype(np.float64)
    return (out, labels, stats) if with_statistics else (out, labels)


def findHomographies(
    corrs,
    w1=0,
    h1=0,
    w2=0,
    h2=0,
    threshold=4.0,
    conf=0.5,
    spatial_coherence_weight=0.0,
    neighborhood_ball_radius=200.0,
    maximum_tanimoto_similarity=0.4,
    max_iters=1000,
    minimum_point_number=10,
    maximum_model_number=-1,
    sampler_id=3,
    scoring_exponent=2,
    do_logging=False,
    random_seed=0,
    with_statistics=False,
    n_restarts=1,
    magsac_levels=4,
    final_relabel=2,
    max_rounds=10,
    pearl_iters=3,
    split_pass=0,
    max_subbatches=None,
    progress_callback=None,
):
    """Multi-homography fitting. corrs: [N,4] = [x1,y1,x2,y2].
    Returns ([3K,3] stacked row-major 3x3s, labeling).

    `magsac_levels` (extension kwarg) defaults to 4: sigma-marginalized
    hypothesis ranking (ops/scoring.sigma_marginalized_preference),
    measured on the bundled AdelaideRMF-H scenes at mean ME 0.045-0.032
    (bench-scale vs 32-lane runs) vs 0.053-0.045 for hard-threshold
    ranking, at equal device time; 0 restores MSAC ranking parity with
    the reference.
    `final_relabel` (extension kwarg, config.final_relabel) defaults to
    2: warm-started ICM against the final descriptors after merge/polish
    (measured 0.0311 vs 0.0318 mean ME on the bundled H scenes at equal
    device time); 0 returns PEARL's last labeling (reference parity).
    `max_rounds` / `pearl_iters` (extension kwargs, config.max_rounds /
    config.pearl_iters) default to reference parity — the 10-round
    proposal cap (progressive_x.h:272) and 3 labeling<->refit
    alternations per round. The bench F protocol runs 6/2 (the measured
    throughput knee, eval/adelaide.F_PROTOCOL); these kwargs make that
    protocol reproducible through the public API.
    `split_pass` (extension kwarg, config.split_pass) defaults to 0:
    final instance-split rounds. The bench H protocol enables 1 round
    for large scenes (unihouse ME 0.0747 -> 0.0708 measured;
    eval/adelaide.H_PROTOCOL has the size-gating rationale).
    `max_subbatches` (extension kwarg) caps the adaptive proposal
    sub-batches per round; None = the measured-optimal default 1 (see
    api._MAX_SUBBATCHES — deeper pools measured WORSE on quality AND
    clock). Pass e.g. ceil(max_iters/256) to honor the literal
    reference semantics of max_iters (progressivex_python.cpp:271):
    the k* confidence stop then draws up to that many sub-batches."""
    corrs = np.asarray(corrs, np.float64)
    if corrs.ndim != 2 or corrs.shape[1] != 4 or corrs.shape[0] < 4:
        raise ValueError("corrs should be an array with dims [n,4], n>=4")
    descs, labels, stats = _run(
        "homography", corrs, None,
        threshold=threshold, conf=conf,
        spatial_coherence_weight=spatial_coherence_weight,
        neighborhood_ball_radius=neighborhood_ball_radius,
        maximum_tanimoto_similarity=maximum_tanimoto_similarity,
        max_iters=max_iters, minimum_point_number=minimum_point_number,
        maximum_model_number=maximum_model_number, sampler_id=sampler_id,
        scoring_exponent=scoring_exponent, do_logging=do_logging,
        random_seed=random_seed, with_statistics=with_statistics,
        n_restarts=n_restarts, magsac_levels=magsac_levels,
        final_relabel=final_relabel, max_rounds=max_rounds,
        pearl_iters=pearl_iters, split_pass=split_pass,
        max_subbatches=max_subbatches,
        progress_callback=progress_callback,
    )
    out = descs.reshape(-1, 3).astype(np.float64)
    return (out, labels, stats) if with_statistics else (out, labels)


def findTwoViewMotions(
    corrs,
    w1=0,
    h1=0,
    w2=0,
    h2=0,
    threshold=4.0,
    conf=0.5,
    spatial_coherence_weight=0.0,
    neighborhood_ball_radius=200.0,
    maximum_tanimoto_similarity=0.4,
    max_iters=1000,
    minimum_point_number=10,
    maximum_model_number=-1,
    sampler_id=3,
    scoring_exponent=3,
    do_logging=False,
    random_seed=0,
    with_statistics=False,
    n_restarts=4,
    magsac_levels=4,
    final_relabel=2,
    restart_rule="energy+5k",
    max_rounds=10,
    pearl_iters=3,
    split_pass=0,
    max_subbatches=None,
    progress_callback=None,
):
    """Multi two-view-motion (fundamental matrix) fitting. corrs: [N,4].
    Returns ([3K,3] stacked row-major 3x3 F matrices, labeling).

    `n_restarts` (extension kwarg) defaults to 4: the 7-point pipeline is
    the noisiest family and energy-selected restarts are the dominant
    quality/time tradeoff for it (see api._MAX_HYP_BY_FAMILY).
    Re-measured round 3 (bundled AdelaideRMF-F, 32 lanes x 3 seeds):
    4 restarts 45.5 scenes/s at mean ME 0.0186 vs 5 restarts 35.8 at
    0.0188 — the 5th buys nothing; 3 restarts were not quality-validated.
    `magsac_levels` (extension kwarg) defaults to 4: sigma-marginalized
    hypothesis ranking (ops/scoring.sigma_marginalized_preference),
    measured to eliminate the catastrophic-labeling tail on the
    AdelaideRMF-F scenes (max per-run ME 0.53 -> 0.08) at identical
    device time; 0 restores hard-threshold MSAC ranking parity.
    `final_relabel` (extension kwarg, config.final_relabel) defaults to 2:
    warm-started ICM sweeps of the PEARL energy against the FINAL
    descriptors, after the merge pass and any polish refits. Measured on
    the bundled AdelaideRMF-F protocol (32 lanes x 5 restarts x 3 seeds):
    mean ME 0.0312 -> 0.0246 (cubetoy per-run max 0.51 -> 0.064) at equal
    device time; 4 sweeps change nothing further (converged at 2). 0
    returns PEARL's last labeling unchanged (reference parity).
    `restart_rule` (extension kwarg, config.restart_rule) defaults to
    "energy+5k": argmin of final total energy + 5 per instance — a
    selection-time label cost that suppresses catastrophic split states
    (a 7-DOF F can overfit half a structure tightly enough to sit within
    a few energy units of the good basin). Measured per-restart
    (tools/f_diagnose.py): cubetoy picked-mean ME 0.0769 -> 0.0375,
    book/breadcube unchanged. "energy" restores the objective-only
    policy; "agreement" (peer-agreement rank blend) measured WORSE
    on-device (0.0394 vs 0.0246) and was retired to a documented
    negative result (docs/DESIGN_NOTES.md).
    `max_rounds` / `pearl_iters` (extension kwargs) default to reference
    parity (10 rounds, progressive_x.h:272; 3 alternations). The bench F
    protocol runs 6/2 — the measured throughput knee (45.6 -> 77.7
    scenes/s at mean ME 0.0186 -> 0.0188, eval/adelaide.F_PROTOCOL) —
    reproducible through the public API via these kwargs.
    `split_pass` (extension kwarg, config.split_pass) defaults to 0:
    rounds of final instance-SPLIT moves (core/pearl.split_instances),
    the move that dissolves "bridge" instances genuinely spanning two
    structures. The essential front end defaults it ON (its gauntlet's
    measured failure mode is a bridge); for F it is opt-in.
    `max_subbatches` (extension kwarg) caps the adaptive proposal
    sub-batches per round; None = the measured-optimal default 1 (see
    api._MAX_SUBBATCHES — the deeper pools the F protocol nominally
    requests measured strictly WORSE: 1/4/20 sub-batches = ME
    0.0245/0.0297/0.0350 at 674/1464/5776 ms). Pass e.g.
    ceil(max_iters/512) to honor the literal reference semantics of
    max_iters (progressivex_python.cpp:271)."""
    corrs = np.asarray(corrs, np.float64)
    if corrs.ndim != 2 or corrs.shape[1] != 4 or corrs.shape[0] < 7:
        raise ValueError("corrs should be an array with dims [n,4], n>=7")
    descs, labels, stats = _run(
        "fundamental", corrs, None,
        threshold=threshold, conf=conf,
        spatial_coherence_weight=spatial_coherence_weight,
        neighborhood_ball_radius=neighborhood_ball_radius,
        maximum_tanimoto_similarity=maximum_tanimoto_similarity,
        max_iters=max_iters, minimum_point_number=minimum_point_number,
        maximum_model_number=maximum_model_number, sampler_id=sampler_id,
        scoring_exponent=scoring_exponent, do_logging=do_logging,
        random_seed=random_seed, with_statistics=with_statistics,
        n_restarts=n_restarts, magsac_levels=magsac_levels,
        final_relabel=final_relabel, restart_rule=restart_rule,
        max_rounds=max_rounds, pearl_iters=pearl_iters,
        split_pass=split_pass, max_subbatches=max_subbatches,
        progress_callback=progress_callback,
    )
    out = descs.reshape(-1, 3).astype(np.float64)
    return (out, labels, stats) if with_statistics else (out, labels)


def findEssentialMatrices(
    corrs,
    K1,
    K2,
    threshold=0.75,
    conf=0.5,
    spatial_coherence_weight=0.1,
    neighborhood_ball_radius=200.0,
    maximum_tanimoto_similarity=0.4,
    max_iters=1000,
    minimum_point_number=10,
    maximum_model_number=-1,
    sampler_id=0,
    scoring_exponent=2,
    do_logging=False,
    random_seed=0,
    with_statistics=False,
    n_restarts=1,
    split_pass=2,
    magsac_levels=4,
    progress_callback=None,
):
    """Multi essential-matrix fitting (EXTENSION: the reference ships the
    five-point solver and estimator headers, `progressive_x.h:19,24`, but
    exposes no Python front end for them).

    corrs: [N,4] = [x1,y1,x2,y2] PIXEL correspondences; K1, K2: [3,3]
    intrinsics. Points are normalized by K^-1 and the threshold divided by
    the mean focal length, mirroring the 6D-pose front end
    (`progressivex_python.cpp:64-98`). The neighborhood graph uses the
    unnormalized pixel correspondences. Returns ([3K_models, 3] stacked
    row-major essential matrices in NORMALIZED coordinates, labeling).

    `split_pass` (extension kwarg, config.split_pass) defaults to 2
    rounds of final instance-split moves (core/pearl.split_instances):
    the essential gauntlet's measured failure mode is a "bridge" E
    genuinely spanning two motions, which wins round 1 on raw support
    and then compound-suppresses the true second motion — only a move
    that restructures an accepted instance recovers it. 0 disables.

    `magsac_levels` (extension kwarg, config.magsac_levels) defaults to 4:
    sigma-marginalized hypothesis ranking. Load-bearing for this family
    since the five-point solver's orthonormal-basis fix: the fixed solver
    recovers near-double roots it used to lose, INCLUDING loose
    mixed-motion bridge roots, and hard-threshold MSAC ranking then lets
    a bridge beat the true motions on raw support. Measured on the
    3-motion gauntlet scene (3 restarts, seeds 0-2): magsac 0 gives
    K=2-4 at ME 0.23-0.51, magsac 4 gives K=3 at ME 0.036-0.046 on every
    seed. 0 restores hard-threshold ranking.
    """
    corrs = np.asarray(corrs, np.float64)
    if corrs.ndim != 2 or corrs.shape[1] != 4 or corrs.shape[0] < 5:
        raise ValueError("corrs should be an array with dims [n,4], n>=5")
    K1 = np.asarray(K1, np.float64)
    K2 = np.asarray(K2, np.float64)
    if K1.shape != (3, 3) or K2.shape != (3, 3):
        raise ValueError("K1/K2 should be arrays with dims [3,3]")
    ones = np.ones((corrs.shape[0], 1))
    n1 = (np.concatenate([corrs[:, :2], ones], 1) @ np.linalg.inv(K1).T)[:, :2]
    n2 = (np.concatenate([corrs[:, 2:4], ones], 1) @ np.linalg.inv(K2).T)[:, :2]
    data = np.concatenate([n1, n2], axis=1)
    f = 0.25 * (K1[0, 0] + K1[1, 1] + K2[0, 0] + K2[1, 1])
    descs, labels, stats = _run(
        "essential", data, None,
        threshold=threshold / f, conf=conf,
        spatial_coherence_weight=spatial_coherence_weight,
        neighborhood_ball_radius=neighborhood_ball_radius,
        maximum_tanimoto_similarity=maximum_tanimoto_similarity,
        max_iters=max_iters, minimum_point_number=minimum_point_number,
        maximum_model_number=maximum_model_number, sampler_id=sampler_id,
        scoring_exponent=scoring_exponent, do_logging=do_logging,
        random_seed=random_seed, graph_data=corrs,
        with_statistics=with_statistics, n_restarts=n_restarts,
        split_pass=split_pass, magsac_levels=magsac_levels,
        progress_callback=progress_callback,
    )
    out = descs.reshape(-1, 3).astype(np.float64)
    return (out, labels, stats) if with_statistics else (out, labels)


def find6DPoses(
    x1y1,
    x2y2z2,
    K,
    threshold=4.0,
    conf=0.90,
    spatial_coherence_weight=0.1,
    neighborhood_ball_radius=20.0,
    maximum_tanimoto_similarity=0.9,
    max_iters=400,
    minimum_point_number=6,
    maximum_model_number=-1,
    do_logging=False,
    random_seed=0,
    with_statistics=False,
    n_restarts=3,
    polish_trim=0.0,
    final_polish=3,
    polish_research=0,
    fuse_duplicates=True,
    progress_callback=None,
):
    """Multi 6D-pose fitting from 2D-3D correspondences.
    x1y1: [N,2] pixel coords, x2y2z2: [N,3] world points, K: [3,3].
    Returns ([3K_models, 4] stacked row-major [R|t] poses, labeling).

    `n_restarts` (extension kwarg) defaults to 3: measured on T-LESS
    across 3 seeds, energy-selected restarts improve the pose-0 rotation
    tail (mean 9.12 -> 8.13 deg; restarts 4-5 never won and change
    nothing). The restart axis vmaps on device, so the cost is far below
    3x wall time and the total stays ~100x under the reference's 57.6 s.

    `fuse_duplicates` (extension kwarg) defaults on: fuse instances whose
    poses agree within 2.5% of the median camera distance in translation
    AND 30 deg in rotation into one instance (support-weighted chordal
    mean rotation + mean translation, labels merged). A cluttered scene
    can split one physical object's correspondences into two instances
    whose poses drift in OPPOSITE directions through their respective
    clutter mixtures (measured on T-LESS seed 1: fragments at 8.8 and
    10.7 deg rotation error, 16.2 deg apart but only 5.7 mm apart in
    translation, whose chordal mean sits at 5.5 deg); averaging cancels
    the drift in a way no single-instance refit can (the GT pose holds
    only 25 of the scene's 2 px-tight points vs the drifted instances'
    62-89 — no support-count objective prefers it). Rotation agreement is
    required: translation-proximal but OPPOSED poses (a real 179-deg
    clutter flip sits 19 mm from the true second pose) must not fuse.

    Preprocessing mirrors `progressivex_python.cpp:64-105`: image points are
    normalized by K^-1 and the threshold divided by the mean focal length;
    the neighborhood graph is built on the UNnormalized 5D rows."""
    x1y1 = np.asarray(x1y1, np.float64)
    x2y2z2 = np.asarray(x2y2z2, np.float64)
    K = np.asarray(K, np.float64)
    if x1y1.ndim != 2 or x1y1.shape[1] != 2 or x1y1.shape[0] < 3:
        raise ValueError("x1y1 should be an array with dims [n,2], n>=3")
    if x2y2z2.shape != (x1y1.shape[0], 3):
        raise ValueError("x2y2z2 should be an array with dims [n,3], n>=3")
    if K.shape != (3, 3):
        raise ValueError("K should be an array with dims [3,3]")

    Kinv = np.linalg.inv(K)
    ones = np.ones((x1y1.shape[0], 1))
    norm_xy = (np.concatenate([x1y1, ones], axis=1) @ Kinv.T)[:, :2]
    data = np.concatenate([norm_xy, x2y2z2], axis=1)
    graph_data = np.concatenate([x1y1, x2y2z2], axis=1)
    f = 0.5 * (K[0, 0] + K[1, 1])

    descs, labels, stats = _run(
        "pnp", data, None,
        threshold=threshold / f, conf=conf,
        spatial_coherence_weight=spatial_coherence_weight,
        neighborhood_ball_radius=neighborhood_ball_radius,
        maximum_tanimoto_similarity=maximum_tanimoto_similarity,
        max_iters=max_iters, minimum_point_number=minimum_point_number,
        maximum_model_number=maximum_model_number, sampler_id=0,
        scoring_exponent=2, do_logging=do_logging, random_seed=random_seed,
        graph_data=graph_data, with_statistics=with_statistics,
        n_restarts=n_restarts, lo_spatial_lambda=0.0,
        final_polish=final_polish, polish_trim=polish_trim,
        polish_research=polish_research,
        progress_callback=progress_callback,
    )
    if fuse_duplicates:
        descs, labels = _fuse_pose_duplicates(
            descs, labels, norm_xy, x2y2z2, threshold / f)
    out = descs.reshape(-1, 4).astype(np.float64)
    return (out, labels, stats) if with_statistics else (out, labels)


def _fuse_pose_duplicates(descs, labels, norm_xy, xyz, thr_norm,
                          rel_radius=0.025, max_rot_deg=30.0):
    """Fuse duplicate pose instances (see find6DPoses.fuse_duplicates).

    descs: [K, 12] row-major [R|t] descriptors; labels: [N] with
    outlier = K; norm_xy/xyz: the K^-1-normalized image points and world
    points; thr_norm: the normalized inlier threshold. Host-side NumPy,
    runs once on the compacted result. Rotation fuses by support-weighted
    chordal mean (drift directions cancel); translation takes the member
    with the highest TIGHT-INLIER DENSITY over its own support (averaging
    translations measured WORSE on T-LESS seed 2 — 18.4 -> 25.7 mm —
    because depth drift is one-sided, while the tightest member's
    translation is the least drifted). Returns (descs [K', 12], labels
    renumbered, outlier = K')."""
    K = descs.shape[0]
    if K <= 1:
        return descs, labels
    labels = np.asarray(labels)
    P = np.asarray(descs, np.float64).reshape(K, 3, 4)
    Rs, ts = P[:, :, :3], P[:, :, 3]
    radius = rel_radius * np.median(np.linalg.norm(ts, axis=1))
    cos_gate = np.cos(np.deg2rad(max_rot_deg))
    tight = 0.5 * thr_norm

    def tight_density(i):
        part = labels == i
        if not part.any():
            return 0.0
        Xc = xyz[part] @ Rs[i].T + ts[i]
        z = np.maximum(Xc[:, 2], 1e-9)
        r = np.linalg.norm(Xc[:, :2] / z[:, None] - norm_xy[part], axis=1)
        return float(np.mean(r < tight))

    sizes = np.array([(labels == i).sum() for i in range(K)], np.float64)

    # Greedy grouping against each group's RUNNING support-weighted mean
    # pose, largest support first — not union-find, whose transitive
    # chains can fuse poses A and C that are each within the gates of B
    # but ~2x the rotation gate apart from each other; the chordal mean
    # then represents neither fragment. Gating every candidate against
    # the aggregate it would join bounds every member's distance to the
    # final fused pose by the gates themselves.
    def _chordal_mean(members):
        w = sizes[members]
        w = w / max(w.sum(), 1.0)
        M = np.einsum("m,mij->ij", w, Rs[members])
        U, _, Vt = np.linalg.svd(M)
        return U @ np.diag([1.0, 1.0, np.linalg.det(U @ Vt)]) @ Vt

    order = sorted(range(K), key=lambda i: -sizes[i])
    group_members: list[list[int]] = []
    for i in order:
        joined = False
        for members in group_members:
            Rm = _chordal_mean(members)
            w = sizes[members]
            tm = (w[:, None] * ts[members]).sum(0) / max(w.sum(), 1.0)
            if np.linalg.norm(ts[i] - tm) >= radius:
                continue
            cos_ang = 0.5 * (np.trace(Rm.T @ Rs[i]) - 1.0)
            if cos_ang < cos_gate:
                continue
            members.append(i)
            joined = True
            break
        if not joined:
            group_members.append([i])

    # Preserve the original instance ordering of the output: key each
    # group by its smallest original index, like the union-find roots did.
    groups = {min(m): sorted(m) for m in group_members}
    reps = sorted(groups)
    new_descs = []
    remap = np.full(K + 1, len(reps), np.int32)  # outlier K -> new K'
    for new_i, rep in enumerate(reps):
        members = groups[rep]
        if len(members) == 1:
            Pf = P[rep]
        else:
            Rf = _chordal_mean(members)
            tf = ts[max(members, key=tight_density)]
            Pf = np.concatenate([Rf, tf[:, None]], axis=1)
        new_descs.append(Pf.reshape(12))
        for m in members:
            remap[m] = new_i
    return np.stack(new_descs), remap[np.asarray(labels, np.int64)]
