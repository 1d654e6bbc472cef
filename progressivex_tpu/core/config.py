"""Engine configuration.

Two tiers, mirroring the reference's `MultiModelSettings`
(`/root/reference/src/pyprogressivex/include/progressive_x.h:32-73`) but
split by compilation role:

  * EngineConfig — STATIC (hashable, baked into the jit): shapes, loop trip
    counts, sampler id, family name. Changing these recompiles.
  * RuntimeParams — DYNAMIC (a pytree of scalars): thresholds, confidence,
    weights. Changing these re-uses the compiled program.

Defaults follow the reference: 10 proposal rounds max
(`progressive_x.h:272`), tanimoto 0.5 / min inliers 20 / max 10 consecutive
rejections (`progressive_x.h:55-72`), PEARL max iterations
(`progressive_x.h:533`), truncation tau_t^2 = 9/4 tau^2
(`progressive_x.h:523`).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class EngineConfig:
    family: str  # model family name (models/base.py registry)
    n_hypotheses: int = 512  # minimal samples drawn per proposal round
    max_models: int = 10  # static slot count (== max accepted, 10 rounds cap)
    max_rounds: int = 10  # reference hard cap (progressive_x.h:272)
    lo_steps: int = 2  # IRLS local-optimization steps per LO candidate
    # (convergence-tested; cap 2 measured ME-identical to 4 on the
    # AdelaideRMF scenes — the PEARL refits continue the polish anyway)
    lo_candidates: int = 4  # top-T admissible hypotheses polished per round
    lo_spatial_lambda: float = 0.5  # blend of own vs neighborhood-mean
    # preference in the LO refit weights (GC-RANSAC spatial coherence
    # analog). 0 disables; the PnP front end disables it because its
    # neighborhood graph lives in a mixed pixel/world 5-D space where the
    # neighborhood mean is not meaningful (api.find6DPoses).
    # (GC-RANSAC analog: LO fires on every new best model during the
    # search; here the post-LO winner is selected, engine._proposal)
    pearl_iters: int = 3  # cap on PEARL alternations (labeling <-> refit).
    # The loop is convergence-tested (|dE| + no-change, PEARL.h:463-467)
    # and measured to converge in 2-3 alternations on the AdelaideRMF
    # scenes (caps 3 and 5 give identical ME); the cap only bounds the
    # worst case, and un-converged scenes continue in the next round's
    # PEARL call.
    icm_sweeps: int = 4  # cap on ICM sweeps per labeling call (the loop
    # is change-detected; caps 4 and 8 measured ME-identical — labelings
    # converge in 2-4 sweeps and harder scenes resettle in later rounds)
    knn_k: int = 12  # neighbor count of the labeling (Potts) graph
    sampler_k: int = 48  # neighbor count for NAPSAC-style local sampling.
    # Decoupled from knn_k: the Potts degree calibrates the spatial energy
    # (raising it over-smooths), while the reference's NAPSAC samples from
    # the full FLANN ball — often hundreds of points at the default radius
    # (progressivex_python.cpp:104-105,237-239) — and minimal samples drawn
    # from a too-local 12-NN patch are near-degenerate for H/F models.
    sampler_id: int = 0  # 0 uniform / 1 PROSAC / 2 P-NAPSAC / 3 NAPSAC
    merge_pass: bool = True  # final pairwise instance-merge moves (the
    # expansion-with-label-costs move class parallel ICM lacks; dissolves
    # split structures — core/pearl.merge_instances)
    split_pass: int = 0  # rounds of final instance-SPLIT moves (the dual
    # of merge_pass; core/pearl.split_instances): dissolves "bridge"
    # instances genuinely spanning two structures, which no proposal or
    # per-point move can fix once the compound penalty suppresses the
    # true per-structure models. Off by default (the H/F protocols never
    # measured a bridge state); the essential front end enables it — its
    # gauntlet's measured failure mode is exactly a bridge
    # (api.findEssentialMatrices, tests/test_gauntlet.py seed 0).
    n_restarts: int = 1  # independent engine restarts per scene, selected
    # by final total energy (data + Potts + label costs). A randomized
    # multi-model fit occasionally rolls a bad local optimum (a split or
    # collapsed structure); restarts run as one extra vmap axis on device —
    # near-free for small scenes — and the energy argmin keeps the good
    # roll. The reference has no counterpart (it cannot afford restarts on
    # CPU); this is the TPU-native way to buy tail quality with FLOPs.
    potts_band: int = 192  # half-width of the block-banded Potts adjacency
    # over spatially-sorted points (ops/labeling.BandedAdj): every neighbor
    # histogram reads [N, 128 + 2*band] instead of [N, N] — the adjacency
    # matmuls are pure HBM-bound and this is a 4-6x traffic cut at N ~ 2k.
    # Edge recall within the band is 97-99% on the AdelaideRMF scenes
    # (measured; small scenes with N <= band are exact). 0 = dense [N, N].
    live_progress: bool = False  # emit a host callback after every round
    # with the round's statistics and the current labeling — the TPU-
    # native counterpart of the reference's ProgressVisualizer hook
    # (progress_visualizer.h:18-247, called at progressive_x.h:476-480).
    # The callback rides jax.debug.callback out of the fused program, so
    # it works inside jit at the cost of a device->host copy per round;
    # off by default (engine.LIVE_CALLBACK holds the consumer).
    # (An earlier `pallas_scoring` flag swapped the proposal's scoring
    # pipeline for the hand-written Pallas kernel; retired round 5 as a
    # measured negative result — XLA's own fusion wins on both protocols.
    # See docs/DESIGN_NOTES.md "Pallas scoring kernel"; the kernel stays
    # parity-tested in ops/pallas_scoring.)
    polish_research: int = 0  # minimal samples per instance for a final
    # TIGHT-THRESHOLD LOCAL RE-SEARCH (engine._polish_research): draw this
    # many minimal samples inside each final instance's support, score
    # candidates by their GLOBAL inlier count at threshold/2 (over all
    # valid points, not just the instance's support — a contaminated
    # structure's true inliers are typically split across instances, see
    # engine.tight_global), GN-polish the winner at the tight scale, and
    # replace the instance's descriptor iff its global tight-inlier count
    # beats the current one's by the acceptance margin.
    # Targets diffuse near-threshold contamination (T-LESS: the winning
    # pose's support is ~30% true object points in a tight <1.5 px core
    # plus ~70% scene clutter spread over 2-6 px; the loose-threshold
    # PEARL/polish refits drift toward the diffuse majority, while at
    # threshold/2 the concentrated true mode outscores any clutter pose —
    # the same local-minimal-re-search recipe that fixed the essential
    # bridge, core/pearl.split_instances.fit_half). Warm-started tight
    # polish alone was measured WORSE round 3 (it keeps the drifted
    # basin); the clean-sample restart is what escapes it. 0 = off.
    polish_trim: float = 0.0  # fraction of each instance's HIGHEST-residual
    # assigned points DROPPED from the final_polish refits (an LTS-style
    # trimmed refit, re-ranked every pass). Targets support contamination:
    # on T-LESS the winning pose instance's support is ~70% points from
    # the other object (io/metrics oracle, round-3 memory) and the plain
    # truncated-IRLS refit is biased toward the contaminant cluster —
    # threshold-tightening cannot fix it (the contaminants sit at LOW
    # residual under the biased pose; measured WORSE round 3) while a
    # rank-based trim adapts to whatever scale the bias sits at. 0 = off;
    # acceptance for a trimmed pass is evaluated on the SAME trimmed
    # subset (a refit moving off the contaminants must not be vetoed by
    # the contaminants' rising residuals). Only meaningful with
    # final_polish > 0.
    final_polish: int = 0  # extra per-instance IRLS refit passes on the
    # FINAL state (after the last round's PEARL + merge): each pass refits
    # every active instance on its assigned points with truncated-
    # preference weights and keeps the result only if the truncated
    # residual sum drops. The pose front end enables this (the PnP
    # reprojection Gauss-Newton gains real accuracy from extra warm
    # iterations; see models/pnp._refine) — H/F keep 0 since PEARL's
    # per-round refits already converge for them.
    unroll_icm: bool = True  # unroll ICM's convergence while_loop into
    # icm_sweeps predicated steps (ops/labeling.icm_sweeps): same labels,
    # one less loop level for the TPU backend's memory-space-assignment
    # pass (the cold-compile driver of the deeply nested fit program).
    # Default ON since round 3 — the while-loop nest drove both the 459s
    # cold compile and the memory-space-assignment check-fail that capped
    # F batches at 160 device rows; the predicated steps are semantically
    # identical and a vmapped batch paid the worst lane's sweep count
    # either way.
    unroll_pearl: bool = True  # same trade for PEARL's alternation loop
    # (core/pearl.pearl_run) AND the final merge pass
    # (core/pearl.merge_instances): pearl_iters / merge-round predicated
    # iterations instead of convergence while_loops. Default ON (round 3,
    # see unroll_icm).
    unroll_rounds: bool = False  # unroll the OUTER proposal-round
    # while_loop into max_rounds predicated rounds. The body already
    # freezes done lanes (engine._fit_prepared), so semantics are
    # identical; trades a 10x larger traced graph for zero while nesting.
    # Off by default: measured on the v5e, the inner unrolls alone fix the
    # compile cliff, and the 10x graph raises tracing time.
    final_relabel: int = 0  # ICM sweeps against the FINAL descriptors
    # (after merge_pass + final_polish): PEARL's last labeling predates the
    # merge reassignments and the polish refits, so boundary points can sit
    # on the label their PRE-polish model preferred. A warm-started relabel
    # of the same energy against the final models moves exactly those
    # points (the instance set is fixed, so the argmin-init rationale of
    # pearl_run does not apply). 0 = off (reference parity: the reference
    # also returns PEARL's last labeling unchanged).
    restart_rule: str = "energy"  # how the winner is picked among
    # n_restarts independent runs: "energy" = argmin final total energy
    # (the reference-style objective-only policy); "energy+<L>k" (e.g.
    # "energy+5k", the findTwoViewMotions default) = argmin of energy +
    # L * n_models, a selection-time label cost that suppresses
    # catastrophic split/collapse basins whose energy is within a few
    # units of the good one (engine.select_restart has the measurement).
    # A third rule, "agreement", was measured worse on device and retired
    # to a documented negative result: docs/DESIGN_NOTES.md.
    n_subbatches: int = 1  # proposal sub-batches per round: the round's
    # search draws up to n_subbatches * n_hypotheses minimal samples,
    # stopping adaptively once the samples drawn exceed the RANSAC
    # k* = log(1-conf)/log(1 - w^m) of the best hypothesis so far — the
    # batched form of GC-RANSAC's adaptive termination, which is what the
    # reference's max_iters bounds (progressivex_python.cpp:271). Typical
    # scenes satisfy k* within the first sub-batch and pay nothing extra;
    # hard scenes (no good model yet) keep searching up to the user's
    # requested budget instead of being silently capped.
    magsac_levels: int = 0  # sigma-marginalized (MAGSAC++-style) scoring:
    # 0 keeps reference hard-tau MSAC ranking parity; m > 0 ranks
    # hypotheses (and weights the LO IRLS) by the preference marginalized
    # over m noise levels sigma_j = (j/m) sigma_max
    # (ops/scoring.sigma_marginalized_preference). Acceptance tests
    # (Tanimoto, inlier counts, compound preference) keep the reference
    # definitions either way.
    neighborhood: str = "knn"  # neighborhood-graph construction: "knn" =
    # radius-gated k-nearest (the FLANN ball graph the reference's Python
    # front ends always build, progressivex_python.cpp:104-105); "grid" =
    # same-grid-cell co-membership (GridNeighborhoodGraph,
    # neighborhood/grid_neighborhood_graph.h — shipped by the reference
    # but never instantiated from Python; provided for parity,
    # ops/knn.grid_graph). Both yield the same [N, k] idx/mask contract;
    # params.neighborhood_radius doubles as the grid cell width.
    hyp_axis: str | None = None  # mesh axis name for hypothesis parallelism:
    # each device draws n_hypotheses samples and the best proposal is
    # reduced across the axis (see parallel/sharding.py)

    def __post_init__(self):
        if self.max_models < self.max_rounds:
            # Every round can accept at most one model; slots must cover it.
            object.__setattr__(self, "max_models", self.max_rounds)


class RuntimeParams(NamedTuple):
    """Dynamic scalars (all jnp 0-d arrays or Python numbers)."""

    threshold: jnp.ndarray  # inlier-outlier threshold tau
    confidence: jnp.ndarray  # RANSAC confidence
    spatial_weight: jnp.ndarray  # PEARL Potts weight w
    neighborhood_radius: jnp.ndarray  # kNN ball radius
    max_tanimoto: jnp.ndarray  # proposal-vs-compound acceptance bound
    min_inliers: jnp.ndarray  # minimum inlier count (also PEARL label cost)
    max_models: jnp.ndarray  # user cap on instances (int32; big = unlimited)
    scoring_exponent: jnp.ndarray  # compound-penalty exponent
    max_rejections: jnp.ndarray  # consecutive-rejection bailout (default 10)
    n_valid: jnp.ndarray  # true (unpadded) point count


def make_params(
    threshold=2.0,
    confidence=0.95,
    spatial_weight=0.14,
    neighborhood_radius=8.0,
    max_tanimoto=0.5,
    min_inliers=20,
    max_models=10**9,
    scoring_exponent=2.0,
    max_rejections=10,
    n_valid=0,
) -> RuntimeParams:
    # NumPy (not jnp) scalars: params often ride into jit as closure
    # constants, and materializing device arrays during lowering forces a
    # device round-trip per leaf — pathologically slow on some hosts.
    import numpy as np

    f = lambda v: np.float32(v) if np.ndim(v) == 0 else np.asarray(v, np.float32)
    i = lambda v: np.int32(v) if np.ndim(v) == 0 else np.asarray(v, np.int32)
    return RuntimeParams(
        threshold=f(threshold),
        confidence=f(confidence),
        spatial_weight=f(spatial_weight),
        neighborhood_radius=f(neighborhood_radius),
        max_tanimoto=f(max_tanimoto),
        min_inliers=i(min_inliers),
        max_models=i(max_models),
        scoring_exponent=f(scoring_exponent),
        max_rejections=i(max_rejections),
        n_valid=i(n_valid),
    )


def truncated_sq_threshold(threshold):
    """tau_t^2 = 9/4 tau^2 (reference progressive_x.h:523)."""
    return 2.25 * threshold * threshold
