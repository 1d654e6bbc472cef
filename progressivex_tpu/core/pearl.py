"""PEARL: alternating labeling / per-instance refit / weak-instance rejection.

TPU-native counterpart of `pearl::PEARL::run`
(`/root/reference/src/pyprogressivex/include/PEARL.h:405-472`):

  while not converged (change detection + |dE| < 1e-5, as PEARL.h:463-467;
  capped at cfg.pearl_iters):
    1. labeling:    ICM over the kNN graph (ops/labeling.py) instead of
                    alpha-expansion (PEARL.h:476-555)
    2. refit:       per-instance weighted non-minimal fit on assigned points
                    (PEARL.h:319-401), accepted only if the summed residual
                    over those points decreases (PEARL.h:393-399)
    3. rejection:   instances with < min_inliers assigned points are
                    deactivated and their points sent to the outlier class
                    (PEARL.h:275-315)

All instances refit in parallel (vmap over the K slots); the labeling is one
dense [N, K+1] computation — there is no per-model or per-point loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from progressivex_tpu.core.config import EngineConfig, RuntimeParams, truncated_sq_threshold
from progressivex_tpu.models.base import ModelFamily
from progressivex_tpu.ops import labeling as labeling_ops

_BIG_COST = 1e18
_SPLIT_SAMPLES = 32  # minimal samples per split half
# (pearl.split_instances): a half that still carries cross-motion or
# outlier contamination at fraction q needs ~log(miss)/log(1-(1-q)^m)
# samples for one all-clean draw — at m=7 (fundamental) and q=0.5 eight
# samples succeed 6% of the time (measured: the F three-motion bridge
# split never fired), 32 reach ~23% per half per round and the 2-round
# split pass compounds; the 5-point essential halves (q~0.15) were
# already served by 8. The samples run as one lanes-major batch, so 4x
# the count is minor against the surrounding fit.


class PearlResult(NamedTuple):
    descs: jnp.ndarray  # [K, D] possibly-refit descriptors
    active: jnp.ndarray  # [K] bool after rejection
    labels: jnp.ndarray  # [N] int32 slot labels; K = outlier
    energy: jnp.ndarray  # scalar final labeling energy


def pearl_run(
    family: ModelFamily,
    cfg: EngineConfig,
    params: RuntimeParams,
    data,  # [N, d]
    point_mask,  # [N] bool
    point_weights,  # [N] user weights for the non-minimal refit
    descs,  # [K, D]
    active,  # [K] bool
    labels,  # [N] warm-start labels (slot space; K = outlier)
    adj,  # [N, N] one-hot or BandedAdj neighborhood adjacency (ops/labeling.py)
) -> PearlResult:
    k_slots = cfg.max_models
    outlier_label = jnp.int32(k_slots)
    trunc_sq = truncated_sq_threshold(params.threshold)
    w = params.spatial_weight

    # Remap labels of now-inactive slots to the outlier class. One-hot
    # compare + any-reduce instead of indexing a [K+1] table by [N] labels:
    # the latter is a TPU gather (milliseconds at N~2k under a scene vmap).
    def sanitize(labels, active):
        lbl_active = labeling_ops.labels_active_mask(labels, active)
        return jnp.where(lbl_active, labels, outlier_label)

    def residual_matrix(descs):
        return jax.vmap(family.squared_residual, in_axes=(None, 0))(data, descs)

    def iteration(carry):
        descs, active, labels, r2, e_prev, it, _ = carry
        # `r2` is the [K, N] squared-residual matrix of the CURRENT descs,
        # carried across iterations and updated in place after accepted
        # refits — the labeling, refit-acceptance and elimination steps all
        # reuse it instead of recomputing (the reference keeps the same
        # cache, PEARL.h:39,52-53,111-118).

        # --- 1. labeling ---
        # (named_scope: phase tag for Statistics.phase_times attribution)
        with jax.named_scope("progx_labeling"):
            dcost = labeling_ops.data_costs(
                r2, active, point_mask, w, trunc_sq)
            # Initialize from the per-point data argmin rather than the
            # previous labeling: parallel ICM cannot flip a whole cluster
            # over the Potts barrier the way an expansion move (global
            # min-cut) can, so a warm start would freeze newly added
            # instances out of the labeling. The argmin start hands each
            # instance its data-supported points and the sweeps then
            # enforce spatial coherence at the boundaries.
            init = jnp.argmin(dcost, axis=0).astype(jnp.int32)
            labels, energy = labeling_ops.icm_sweeps(
                dcost, init, adj, w, cfg.icm_sweeps, unroll=cfg.unroll_icm
            )

        # --- 2. per-instance refit (vmapped over slots) ---
        onehot = (labels[:, None] == jnp.arange(k_slots)[None, :]) & point_mask[
            :, None
        ]  # [N, K]
        counts = jnp.sum(onehot, axis=0)  # [K]
        # IRLS weighting: assigned points weighted by their truncated
        # preference under the CURRENT model, then one reweighted pass.
        # The reference refits with plain user weights (PEARL.h:375-380),
        # but its labelings come from exact expansion moves and its
        # estimators run on CPU doubles; here an instance's point set
        # includes spatially-coherent boundary junk whose near-threshold
        # residuals dominate an unweighted ALGEBRAIC solve (measured on
        # AdelaideRMF-F: plain one-hot refits routinely RAISED the Sampson
        # residual sum and were vetoed, leaving fits loose enough that the
        # label-cost deletion test killed genuine structures — the
        # breadcube K=1 collapse).
        # NB: refit weights stay on the TRUNCATED preference even when
        # sigma-marginalized RANKING is enabled (cfg.magsac_levels) —
        # measured on AdelaideRMF-F: sigma-marginalized IRLS weights here
        # overweight the tightest residuals and let refits drift onto
        # sub-clusters (mean ME 0.0245 -> 0.0479). Ranking and refitting
        # want different weightings.
        pref_w = jnp.maximum(0.0, 1.0 - r2 / trunc_sq)  # [K, N]
        fit_w = onehot.T.astype(data.dtype) * point_weights[None, :]  # [K, N]
        with jax.named_scope("progx_refit"):
            new_descs, fit_ok = jax.vmap(family.refit, in_axes=(None, 0, 0))(
                data, fit_w * pref_w, descs
            )
            r2_mid = residual_matrix(new_descs)
        # Refit acceptance on TRUNCATED residuals: an instance can hold
        # spatially-coherent junk members whose huge residuals dominate an
        # untruncated sum and veto refits that improve the data-supported
        # core (the reference compares raw sums, PEARL.h:368-399, but its
        # energy — like ours — only ever sees truncated costs, so the
        # truncated comparison matches the objective actually optimized).
        cap = 2.25 * trunc_sq

        def trunc_sum(r2m):
            return jnp.sum(onehot.T * jnp.sqrt(jnp.minimum(r2m, cap)), axis=1)

        res_before = trunc_sum(r2)
        res_one = jnp.where(fit_ok, trunc_sum(r2_mid), jnp.inf)
        # Second IRLS pass with preferences recomputed under the first
        # iterate. Measured to matter for every family tried: F's
        # Sampson-reweighted eight point takes a true second Gauss-Newton
        # step, and even the homography's closed-form LSQ tightens because
        # the PREFERENCE weights change (unihouse mean ME 0.21 -> 0.17
        # with the second pass). Cost is ~10% of a large-scene fit.
        pref_mid = jnp.maximum(0.0, 1.0 - r2_mid / trunc_sq)
        with jax.named_scope("progx_refit"):
            descs2, ok2 = jax.vmap(family.refit, in_axes=(None, 0, 0))(
                data, fit_w * pref_mid, new_descs
            )
            r2_two = residual_matrix(descs2)
        res_two = jnp.where(fit_ok & ok2, trunc_sum(r2_two), jnp.inf)
        # Best of the two IRLS iterates (the second is usually tighter
        # but not monotonically so).
        use_two = res_two < res_one
        new_descs = jnp.where(use_two[:, None], descs2, new_descs)
        r2_new = jnp.where(use_two[:, None], r2_two, r2_mid)
        res_after = jnp.minimum(res_one, res_two)
        accept = (
            fit_ok
            & active
            & (counts >= family.nonminimal_min)
            & (res_after < res_before)
        )
        descs = jnp.where(accept[:, None], new_descs, descs)
        r2 = jnp.where(accept[:, None], r2_new, r2)

        # --- 3. label-cost elimination + weak-instance rejection ---
        # GCO charges `minimum_inlier_number` per label in use
        # (PEARL.h:144,:528-529); expansion therefore absorbs any instance
        # whose total energy advantage over the points' best alternative
        # label is below that cost — this is what kills phantom instances
        # and merges split ones. Vectorized equivalent: per active label,
        # gain = sum over its points of (best-alternative data cost - own
        # data cost); drop the weakest label if gain < label cost. One
        # deletion per PEARL iteration (like sequential expansion), points
        # are re-assigned by data argmin over the survivors.
        dcost2 = labeling_ops.data_costs(r2, active, point_mask, w, trunc_sq)
        # One-hot [L, N] of the current labeling; mult-sum against it
        # replaces per-point gathers/scatters over the label axis (L is
        # tiny, the dense form vectorizes; TPU scatters do not).
        own_oh = labels[None, :] == jnp.arange(k_slots + 1)[:, None]
        chosen = jnp.sum(jnp.where(own_oh, dcost2, 0.0), axis=0)
        excl = jnp.where(own_oh, _BIG_COST, dcost2)
        alt = jnp.min(excl, axis=0)
        alt_label = jnp.argmin(excl, axis=0).astype(labels.dtype)
        # EXACT group-move deletion test, evaluated for EVERY active label:
        # deleting label l relabels all its points to their best
        # alternative at once (the binary expansion move GCO's label-cost
        # extension solves, Delong et al.; setLabelCost at PEARL.h:528-529)
        # and is worth it iff
        #   Delta_data(l) + Delta_potts(l) < label_cost.
        # Delta_data is the per-point margin sum; Delta_potts is computed
        # EXACTLY for the hypothetical relabeling of each candidate — one
        # batched adjacency matmul for all K candidates at once. Earlier
        # per-point Potts approximations failed in both directions:
        # "-2w * boundary cut" deleted real structures at w=0.5 (the cut is
        # not recovered when points keep mismatching under their new
        # label), and "+2w * (own - target) same-neighbors" protected every
        # compact instance, including duplicate twins. The exact delta
        # keeps genuinely supported structures (data margin > cost, Potts
        # ~ unchanged under a group move), kills scattered pseudo-models
        # (Potts drops when stragglers rejoin their neighbors' label) and
        # kills duplicate twins (data margin ~ 0).
        point_gain = jnp.where(point_mask, alt - chosen, 0.0)
        slot_ids = jnp.arange(k_slots)
        onehot2 = labels[:, None] == slot_ids[None, :]
        data_delta = jnp.sum(jnp.where(onehot2, point_gain[:, None], 0.0), axis=0)
        data_delta = jnp.where(active, data_delta, jnp.inf)
        # The candidate is picked by the data margin alone (duplicates ~ 0
        # < scattered pseudo-models ~ label_cost < real structures >> it,
        # and deletion repeats every iteration so a mis-ordered runner-up
        # is tested next); the exact Potts delta is then computed for THAT
        # ONE candidate — one [N,N]@[N,L] matmul instead of K of them
        # (the all-candidates einsum was ~8 ms/iteration, the single
        # largest PEARL line item).
        weakest = jnp.argmin(data_delta)
        labels_wo = jnp.where(labels == weakest, alt_label, labels)
        same_wo = labeling_ops.neighbor_label_counts(adj, labels_wo, k_slots + 1)
        own_wo = jnp.sum(
            jnp.where(labels_wo[None, :] == jnp.arange(k_slots + 1)[:, None],
                      same_wo, 0.0),
            axis=0,
        )
        same_now = labeling_ops.neighbor_label_counts(adj, labels, k_slots + 1)
        own_now = jnp.sum(jnp.where(own_oh, same_now, 0.0), axis=0)
        # deg cancels in the difference: potts_wo - potts_now =
        # w * (sum(own_now) - sum(own_wo)).
        potts_delta = w * (jnp.sum(own_now) - jnp.sum(own_wo))
        # Only Potts SAVINGS count toward deletion. A negative delta is
        # real: a scattered pseudo-model's stragglers rejoin their
        # neighbors' label and mismatches vanish. A positive delta is an
        # artifact of the crude one-shot argmin reassignment fragmenting
        # the deleted set — the ICM pass that follows would immediately
        # smooth it out — and counting it protected compact-but-redundant
        # partial models (measured: fundamental-matrix scenes fragmented
        # into 3-4 partial instances that each "cost too much Potts" to
        # delete).
        gain = data_delta[weakest] + jnp.minimum(0.0, potts_delta)
        label_cost = params.min_inliers.astype(gain.dtype)
        do_delete = gain < label_cost
        active = active & ~(do_delete & (jnp.arange(k_slots) == weakest))

        counts2 = jnp.sum(
            ((labels[:, None] == jnp.arange(k_slots)[None, :]) & point_mask[:, None]),
            axis=0,
        )
        active = active & (counts2 >= params.min_inliers)

        # Re-assign points of removed instances by data argmin.
        dcost3 = labeling_ops.data_costs(r2, active, point_mask, w, trunc_sq)
        labels = jnp.where(
            labeling_ops.labels_active_mask(labels, active),
            labels,
            jnp.argmin(dcost3, axis=0).astype(labels.dtype),
        )

        # Convergence bookkeeping (reference PEARL.h:463-467: converged iff
        # nothing changed AND |E - E_prev| < 1e-5, after at least one full
        # alternation). `changed` drives the while_loop condition below.
        changed = (
            jnp.any(accept)
            | jnp.any(active != carry[1])
            | jnp.any(labels != carry[2])
            | (jnp.abs(energy - e_prev) >= 1e-5 * (1.0 + jnp.abs(energy)))
        )
        return (descs, active, labels, r2, energy, it + 1, changed)

    def cond(carry):
        it, changed = carry[5], carry[6]
        return (it < cfg.pearl_iters) & changed

    labels = sanitize(labels, active)
    r2_init = residual_matrix(descs)
    init = (
        descs, active, labels, r2_init,
        jnp.array(jnp.inf, r2_init.dtype), jnp.int32(0), jnp.ones((), bool),
    )
    # while_loop instead of a fixed-trip scan: the reference iterates PEARL
    # to convergence (PEARL.h:421-422,:463-467); under vmap a batch of
    # scenes pays max-iterations-needed, not the worst-case cap, and a
    # converged (or round-rejected, hence unchanged) scene exits after one
    # cheap verification iteration. cfg.unroll_pearl trades the loop for
    # pearl_iters predicated iterations (flatter compile graph, same
    # result — a converged carry passes through unchanged).
    if cfg.unroll_pearl:
        carry = init
        for _ in range(cfg.pearl_iters):
            new = iteration(carry)
            keep = carry[6]
            carry = tuple(jnp.where(keep, n, c) for n, c in zip(new, carry))
        descs, active, labels, _, energy, _, _ = carry
    else:
        descs, active, labels, _, energy, _, _ = lax.while_loop(
            cond, iteration, init)
    return PearlResult(descs, active, labels, energy)


def merge_instances(
    family,
    cfg: EngineConfig,
    params: RuntimeParams,
    data,  # [N, d]
    point_mask,  # [N] bool
    point_weights,  # [N]
    descs,  # [K, D]
    active,  # [K] bool
    labels,  # [N] slot labels, K = outlier
    adj,  # [N, N] or BandedAdj adjacency
    n_rounds: int = 3,
):
    """Explicit pairwise instance-merge moves.

    Alpha-expansion with label costs can dissolve a split structure (two
    overfit "twin" instances each owning half of one real structure) by
    expanding one label over the other and recovering the label cost;
    parallel ICM has no such move, and the split is a stable equilibrium
    of per-point updates (each twin fits its own half tighter than the
    other twin does). This pass replicates the missing move class
    directly: for every active pair (i, j), refit one model on the union
    of their points and accept the merge iff the energy change

        sum_union (cost_new - cost_old) - label_cost - 2w * cut(i, j)

    is negative (the i-j boundary Potts cut also vanishes). One merge per
    round, up to `n_rounds` rounds. A merged model over two genuinely
    distinct structures fits neither half and is rejected by the data
    term, so true multi-instance scenes are untouched (measured: fixes
    the ME ~0.5 "split" blowups on the AdelaideRMF-F scenes without
    degrading the clean runs).
    """
    k_slots = cfg.max_models
    outlier_label = jnp.int32(k_slots)
    trunc_sq = truncated_sq_threshold(params.threshold)
    w = params.spatial_weight
    label_cost = params.min_inliers.astype(data.dtype)
    n_cand = min(8, (k_slots * (k_slots - 1)) // 2)

    all_pi = jnp.array(
        [i for i in range(k_slots) for j in range(i + 1, k_slots)]
    )
    all_pj = jnp.array(
        [j for i in range(k_slots) for j in range(i + 1, k_slots)]
    )

    def one_round(carry):
        descs, active, labels, it, changed = carry
        r2 = jax.vmap(family.squared_residual, in_axes=(None, 0))(data, descs)
        dcost = labeling_ops.data_costs(r2, active, point_mask, w, trunc_sq)
        own_oh = labels[None, :] == jnp.arange(k_slots + 1)[:, None]
        chosen = jnp.sum(jnp.where(own_oh, dcost, 0.0), axis=0)  # [N]

        # Label-contact matrix from ONE adjacency pass: contact[i, j] =
        # number of directed edges from points of label i to points of
        # label j. It provides every pair's boundary cut for the energy
        # test below AND ranks merge candidates — two spatially disjoint
        # instances (contact 0) can never profit from a merge, so only the
        # top-contact pairs run the expensive refit (8 instead of all 45;
        # the per-pair adjacency matmul for the cut was the whole cost of
        # this pass).
        same = labeling_ops.neighbor_label_counts(adj, labels, k_slots + 1)
        contact = (
            jnp.where(own_oh, 1.0, 0.0) @ same.T
        )  # [L, L]

        pair_score = jnp.where(
            active[all_pi] & active[all_pj],
            contact[all_pi, all_pj] + contact[all_pj, all_pi],
            -1.0,
        )
        _, cand = lax.top_k(pair_score, n_cand)
        pi = all_pi[cand]
        pj = all_pj[cand]

        def try_pair(i, j):
            in_i = (labels == i) & point_mask
            in_j = (labels == j) & point_mask
            union = in_i | in_j
            # IRLS on the union, seeded with PREFERENCE weights: a label's
            # point set can contain a few outliers, and the eight-point
            # style LSQ is outlier-sensitive enough that flat union weights
            # produced garbage fits (measured mean r^2/tau_t^2 ~ 13 on a
            # union whose clean subset fits at 0.37) which vetoed every
            # genuine merge. max(pref_i, pref_j) keeps both halves at full
            # weight and zeroes points neither model explains.
            pref_ij = jnp.maximum(
                jnp.maximum(0.0, 1.0 - r2[i] / trunc_sq),
                jnp.maximum(0.0, 1.0 - r2[j] / trunc_sq),
            )
            # IRLS acceptance on the TRUNCATED residual sum (cap as in
            # engine._final_polish): judging steps on the RAW union sum
            # let the union's few claimed outliers veto genuinely
            # improving steps (their huge residuals fluctuate more than
            # the inlier mass improves — measured on a split-blowup
            # state: both IRLS steps rejected, merged model stuck at
            # union rms 1.65 and the merge vetoed at +14 energy, where
            # the converged refit merges at -36).
            cap = 2.25 * trunc_sq

            def trunc_sum(r2v):
                return jnp.sum(jnp.where(
                    union, jnp.sqrt(jnp.minimum(r2v, cap)), 0.0))

            def irls(nd0, r2n0):
                # fori_loop, not an unrolled Python loop: the refit body
                # inlines the unrolled Gauss-Jordan solvers, and this
                # pass runs 4 IRLS chains per candidate pair — unrolled
                # it was the largest single chunk of the fit program's
                # traced graph (compile-time relevant, not speed).
                def body(_, carry):
                    nd, r2n = carry
                    pref = jnp.maximum(0.0, 1.0 - r2n / trunc_sq)
                    wts2 = pref * union.astype(data.dtype) * point_weights
                    nd2, ok2 = family.refit(data, wts2, nd)
                    r2n2 = family.squared_residual(data, nd2)
                    better = ok2 & (trunc_sum(r2n2) < trunc_sum(r2n))
                    return (jnp.where(better, nd2, nd),
                            jnp.where(better, r2n2, r2n))

                return lax.fori_loop(0, 3, body, (nd0, r2n0))

            # TWO merged-model candidates, best by truncated sum:
            # (a) warm: refit from descs[i] with max-preference seeding —
            #     right when at least one twin is a good model of the
            #     union (the common split-of-a-good-structure case);
            # (b) cold: stateless non-minimal fit on FLAT union weights —
            #     when BOTH twins are bad, their preference weights
            #     poison every seeded fit (measured on a cubetoy
            #     both-halves-bad state: warm 2.63 / cold-with-pref 2.34
            #     / cold-flat 1.08 structure rms).
            wts = pref_ij * union.astype(data.dtype) * point_weights
            nd_w, ok_w = family.refit(data, wts, descs[i])
            nd_w, r2_w = irls(nd_w, family.squared_residual(data, nd_w))
            nd_c, ok_c = family.nonminimal_solver(
                data, union.astype(data.dtype) * point_weights)
            nd_c, r2_c = irls(nd_c, family.squared_residual(data, nd_c))
            use_cold = ok_c & ((trunc_sum(r2_c) < trunc_sum(r2_w)) | ~ok_w)
            nd = jnp.where(use_cold, nd_c, nd_w)
            r2n = jnp.where(use_cold, r2_c, r2_w)
            ok = ok_w | ok_c
            ratio = r2n / trunc_sq
            c_new = jnp.where(ratio > 1.0, 2.0 * (1.0 - w), (1.0 - w) * ratio)
            d_data = jnp.sum(jnp.where(union, c_new - chosen, 0.0))
            # The i-j boundary cut disappears when both sides share a
            # label; it is exactly the precomputed contact entry.
            cut = contact[i, j]
            both = active[i] & active[j]
            delta = d_data - label_cost - 2.0 * w * cut
            return nd, jnp.where(both & ok, delta, jnp.inf)

        new_descs, deltas = jax.vmap(try_pair)(pi, pj)

        # The static delta above holds every label fixed, which
        # UNDERESTIMATES merge profit: after a real merge the labeling
        # re-equilibrates (the merged model picks up boundary points and
        # near-threshold outliers both twins dropped). Measured on the
        # split-blowup breadcube states: static delta positive (merge
        # vetoed) while the true post-relabel energies were 101.0 -> 79.2,
        # 139.3 -> 103.0, 97.9 -> 71.9 (ME 0.43-0.51 -> 0.004-0.066) —
        # and the split pair is not even the static argmin, so a
        # single-pair upgrade misses it. Every candidate pair is
        # therefore scored by the FULL labeling energy (data + Potts +
        # label costs) of its merged-and-relabeled state; the best pair
        # is applied iff it beats the current state's energy.
        def total_energy(dcost_, labels_, active_):
            e = labeling_ops.labeling_energy(dcost_, labels_, adj, w)
            return e + label_cost * jnp.sum(active_)

        def eval_pair(i, j, nd, delta):
            m_descs = descs.at[i].set(nd)
            m_active = active.at[j].set(False)
            m_labels = jnp.where(labels == j, i, labels)
            r2_m = jax.vmap(family.squared_residual, in_axes=(None, 0))(
                data, m_descs)
            dcost_m = labeling_ops.data_costs(
                r2_m, m_active, point_mask, w, trunc_sq)
            m_labels, _ = labeling_ops.icm_sweeps(
                dcost_m, m_labels, adj, w, 2, unroll=cfg.unroll_icm)
            e = total_energy(dcost_m, m_labels, m_active)
            return m_labels, jnp.where(jnp.isfinite(delta), e, jnp.inf)

        m_labels_all, e_all = jax.vmap(eval_pair)(pi, pj, new_descs, deltas)
        best = jnp.argmin(e_all)
        bi, bj = pi[best], pj[best]
        e_cur = total_energy(dcost, labels, active)
        do = (e_all[best] < e_cur) & jnp.isfinite(e_all[best])
        descs = jnp.where(do, descs.at[bi].set(new_descs[best]), descs)
        active = jnp.where(do, active.at[bj].set(False), active)
        labels = jnp.where(do, m_labels_all[best], labels)
        return descs, active, labels, it + 1, do

    def cond(carry):
        return carry[4] & (carry[3] < n_rounds)

    init = (descs, active, labels, jnp.int32(0), jnp.ones((), bool))
    if cfg.unroll_pearl:
        # Predicated unroll (see config.unroll_pearl): a round whose
        # predecessor made no merge passes through unchanged.
        carry = init
        for _ in range(n_rounds):
            new = one_round(carry)
            keep = carry[4]
            carry = tuple(jnp.where(keep, n, c) for n, c in zip(new, carry))
        descs, active, labels, _, _ = carry
    else:
        descs, active, labels, _, _ = lax.while_loop(cond, one_round, init)
    labels = jnp.where(
        labeling_ops.labels_active_mask(labels, active),
        labels, outlier_label,
    )
    return descs, active, labels


def split_instances(
    family,
    cfg: EngineConfig,
    params: RuntimeParams,
    data,  # [N, d]
    point_mask,  # [N] bool
    point_weights,  # [N]
    descs,  # [K, D]
    active,  # [K] bool
    labels,  # [N] slot labels, K = outlier
    adj,  # [N, N] or BandedAdj adjacency
    n_rounds: int = 2,
):
    """Explicit instance-split moves — the dual of `merge_instances`.

    A "bridge" instance genuinely spanning two structures is a stable
    equilibrium of the whole pipeline, not just of ICM: a bridge model
    with more raw support than either true structure wins the MSAC
    proposal round (as it must under any MSAC ranking, including the
    reference's), and afterwards the compound overlap penalty
    (`scoring_function_with_compound_model.h:109-121`) suppresses the
    true per-structure models — the measured essential-gauntlet seed-0
    failure (K=1, ME 0.26: one E covering motion 1 plus half of motion
    2 while the rest of motion 2 stays outlier-labeled). No later
    proposal can fix that state; only a move that RESTRUCTURES an
    accepted instance can.

    The move, per round: for every active instance, partition its
    support by the sign of the projection onto the principal axis of
    its centered data rows (bridged structures are spatially disjoint,
    so the top-variance direction separates them), recover one model
    per half by a LOCAL minimal-solver search inside the half (see
    fit_half — a direct LSQ is unrecoverably biased by the ~15%
    cross-contamination a PCA half carries) plus preference-IRLS, give
    the second half the first inactive slot, re-equilibrate with a warm
    ICM relabel — the split-off model claims the points of "its"
    structure that the bridge state left as outliers — and accept the
    single best split iff the full labeling energy (data + Potts +
    label costs) drops. The
    +label_cost term in the acceptance is the exact dual of merge's
    −label_cost: a split must pay for its new instance, so clean
    single-structure instances never split (their halves refit to the
    same model and the relabel undoes the partition, leaving pure
    label-cost loss).
    """
    k_slots = cfg.max_models
    outlier_label = jnp.int32(k_slots)
    trunc_sq = truncated_sq_threshold(params.threshold)
    w = params.spatial_weight
    label_cost = params.min_inliers.astype(data.dtype)
    min_half = max(family.nonminimal_min, 3)

    def one_round(carry):
        descs, active, labels, it, changed = carry
        r2 = jax.vmap(family.squared_residual, in_axes=(None, 0))(data, descs)
        dcost = labeling_ops.data_costs(r2, active, point_mask, w, trunc_sq)

        def total_energy(dcost_, labels_, active_):
            e = labeling_ops.labeling_energy(dcost_, labels_, adj, w)
            return e + label_cost * jnp.sum(active_)

        e_cur = total_energy(dcost, labels, active)
        # The split-off half lands in the first inactive slot; with every
        # slot occupied there is no legal split (argmin of bool = first
        # False when one exists).
        free = jnp.argmin(active)
        has_free = ~active[free]

        def fit_half(part):
            # LOCAL MINIMAL-SOLVER SEARCH within the half, not a direct
            # LSQ: a bridge's PCA half still carries ~15% structured
            # contamination from the other structure, and (measured on
            # the essential bridge scene) that biases the weighted
            # non-minimal solve so badly that neither preference-IRLS
            # nor scale-annealed IRLS can bootstrap out of it — while a
            # handful of minimal samples drawn inside the half lands on
            # an all-clean sample with probability ~1-(1-0.84^m)^S and
            # recovers the half's true model outright (best-of-8 scored
            # 82/90 support where the LSQ route scored 19). Samples are
            # deterministic strides over the half's points (no RNG
            # plumbing; RANSAC-style coverage is all that matters):
            # within one sample the m indices are i*7 + floor(j*npart/m),
            # which are pairwise distinct whenever npart >= m (the floor
            # terms are strictly increasing and < npart) — the old
            # co-prime i*7 + j*13 stride collapsed to duplicated in-sample
            # points whenever npart was a multiple of 13 (ADVICE r3).
            npart = jnp.sum(part)
            m = family.sample_size
            order = jnp.argsort(jnp.where(part, 0, 1), stable=True)
            s_ix = (jnp.arange(_SPLIT_SAMPLES)[:, None] * 7
                    + (jnp.arange(m)[None, :] * npart) // m
                    ) % jnp.maximum(npart, 1)
            samp = data[order[s_ix]]  # [S, m, d]
            if family.minimal_solver_batched is not None:
                dh, vh = family.minimal_solver_batched(samp)
            else:
                dh, vh = jax.vmap(family.minimal_solver)(samp)
            flat = dh.reshape(-1, family.desc_dim)
            vf = vh.reshape(-1)
            r2h = jax.vmap(family.squared_residual, in_axes=(None, 0))(
                data, flat)
            support = jnp.sum(
                jnp.maximum(0.0, 1.0 - r2h / trunc_sq) * part[None, :],
                axis=1)
            support = jnp.where(vf, support, -1.0)
            best_h = jnp.argmax(support)
            nd = flat[best_h]
            ok = support[best_h] > 0.0
            # Preference-IRLS polish with truncated-sum acceptance (the
            # merge pass's measured recipe: raw-sum acceptance lets a few
            # claimed outliers veto real steps).
            wts = part.astype(data.dtype) * point_weights
            cap = 2.25 * trunc_sq

            def tsum(r2v):
                return jnp.sum(jnp.where(
                    part, jnp.sqrt(jnp.minimum(r2v, cap)), 0.0))

            def body(_, c):
                nd0, r2n0 = c
                pref = jnp.maximum(0.0, 1.0 - r2n0 / trunc_sq)
                nd2, ok2 = family.refit(data, pref * wts, nd0)
                r2n2 = family.squared_residual(data, nd2)
                better = ok2 & (tsum(r2n2) < tsum(r2n0))
                return (jnp.where(better, nd2, nd0),
                        jnp.where(better, r2n2, r2n0))

            nd, _ = lax.fori_loop(
                0, 3, body, (nd, family.squared_residual(data, nd)))
            return nd, ok

        def try_split(i):
            sup = (labels == i) & point_mask
            n_sup = jnp.sum(sup)
            wsup = sup.astype(data.dtype)
            mu = (jnp.sum(data * wsup[:, None], axis=0)
                  / jnp.maximum(n_sup, 1).astype(data.dtype))
            xc = (data - mu) * wsup[:, None]
            cov = xc.T @ xc  # [d, d], d <= 5 — tiny host-side-size matrix
            v = jnp.ones((data.shape[1],), data.dtype)
            for _ in range(8):  # power iteration; d is tiny, 8 is plenty
                v = cov @ v
                v = v / jnp.maximum(jnp.linalg.norm(v), 1e-12)
            proj = xc @ v
            part2 = sup & (proj > 0)
            part1 = sup & ~part2
            nd1, ok1 = fit_half(part1)
            nd2, ok2 = fit_half(part2)
            m_descs = descs.at[i].set(nd1).at[free].set(nd2)
            m_active = active.at[free].set(True)
            m_labels = jnp.where(part2, free, labels)
            r2_m = jax.vmap(family.squared_residual, in_axes=(None, 0))(
                data, m_descs)
            dcost_m = labeling_ops.data_costs(
                r2_m, m_active, point_mask, w, trunc_sq)
            # 4 sweeps, not the merge pass's 2: a split's re-equilibration
            # must PROPAGATE — the split-off model reclaims its structure's
            # points from the outlier class through the Potts neighborhood,
            # and on the measured bridge scene 2 sweeps left the candidate
            # at +6.8 energy (rejected) where 4 reached -5.9 (accepted).
            m_labels, _ = labeling_ops.icm_sweeps(
                dcost_m, m_labels, adj, w, 4, unroll=cfg.unroll_icm)
            e = total_energy(dcost_m, m_labels, m_active)
            feasible = (active[i] & has_free & ok1 & ok2
                        & (jnp.sum(part1) >= min_half)
                        & (jnp.sum(part2) >= min_half))
            return m_descs, m_active, m_labels, jnp.where(
                feasible, e, jnp.inf)

        m_descs_all, m_active_all, m_labels_all, e_all = jax.vmap(try_split)(
            jnp.arange(k_slots))
        best = jnp.argmin(e_all)
        do = jnp.isfinite(e_all[best]) & (e_all[best] < e_cur)
        descs = jnp.where(do, m_descs_all[best], descs)
        active = jnp.where(do, m_active_all[best], active)
        labels = jnp.where(do, m_labels_all[best], labels)
        return descs, active, labels, it + 1, do

    def cond(carry):
        return carry[4] & (carry[3] < n_rounds)

    init = (descs, active, labels, jnp.int32(0), jnp.ones((), bool))
    if cfg.unroll_pearl:
        carry = init
        for _ in range(n_rounds):
            new = one_round(carry)
            keep = carry[4]
            carry = tuple(jnp.where(keep, n, c) for n, c in zip(new, carry))
        descs, active, labels, _, _ = carry
    else:
        descs, active, labels, _, _ = lax.while_loop(cond, one_round, init)
    labels = jnp.where(
        labeling_ops.labels_active_mask(labels, active),
        labels, outlier_label,
    )
    return descs, active, labels
