"""Compound-penalized MSAC scoring — the hot loop of the framework.

Reference parity: `MSACScoringFunctionWithCompoundModel::getScore`
(`/root/reference/src/pyprogressivex/include/
scoring_function_with_compound_model.h:61-125`):
  * per-point score = max(0, 1 - r^2 / tau_trunc^2) for r^2 < tau_trunc^2
  * model score     = sum(per-point) - (sum min(pref, compound_pref))^e
where tau_trunc^2 = 9/4 * tau^2 (`progressive_x.h:523`).

The reference evaluates one hypothesis at a time over a per-point loop with
an early exit; here a whole batch of hypotheses is scored as a dense [B, N]
preference tensor in one fused XLA computation (reductions ride the VPU,
the residual construction upstream is batched matmuls on the MXU).
"""

from __future__ import annotations

import jax.numpy as jnp


def truncated_preference(sq_residuals, truncated_sq_threshold):
    """max(0, 1 - r^2/tau_t^2) (reference progx_model.h:70-87). Any shape."""
    return jnp.maximum(0.0, 1.0 - sq_residuals / truncated_sq_threshold)


def sigma_marginalized_preference(sq_residuals, truncated_sq_threshold,
                                  n_levels: int):
    """MAGSAC++-style sigma-marginalized soft preference.

    Instead of committing to one inlier-outlier threshold, marginalize the
    truncated-quadratic preference over a ladder of noise scales
    sigma_j = (j/m) * sigma_max, j = 1..m (the discrete sigma partition of
    MAGSAC / MAGSAC++, Barath et al. 2020 — their practical implementation
    also integrates over a finite sigma partition rather than the
    continuous integral):

        pref(r) = 1/m * sum_j max(0, 1 - r^2 / (j/m)^2 tau_t^2)

    Relative to the hard-tau MSAC preference this concentrates mass on
    VERY tight residuals (a point at r ~ 0 scores 1 under every level, a
    marginal point near tau_t only under the widest), so hypothesis
    ranking prefers precisely-fit models over loose "bridge" models with
    the same inlier count. Used for ranking and IRLS weighting only — the
    compound preference / Tanimoto validation keeps the reference's
    hard-tau definition (progx_model.h:70-87) for acceptance parity.
    """
    x = sq_residuals / truncated_sq_threshold
    m = float(n_levels)
    acc = 0.0
    for j in range(1, n_levels + 1):
        s2 = (j / m) ** 2
        acc = acc + jnp.maximum(0.0, 1.0 - x / s2)
    return acc / m


def compound_penalized_scores(
    sq_residuals,  # [B, N]
    compound_pref,  # [N]
    point_mask,  # [N] bool (False for padding)
    truncated_sq_threshold,  # scalar
    exponent,  # scalar (scoring_exponent kwarg)
    has_compound,  # scalar bool: any model in the compound instance yet?
    magsac_levels: int = 0,  # 0 = reference MSAC parity; >0 = rank by the
    # sigma-marginalized preference with this many levels
):
    """Score every hypothesis against the data and the compound instance.

    Everything returned is a REDUCTION over the point axis — the [B, N]
    preference matrix is deliberately never part of the interface, so XLA
    fuses residual construction, preference, penalty and the Tanimoto
    moments into one pass over the hypothesis batch instead of
    materializing [B, N] intermediates for separate consumers.

    Returns:
      scores [B]: penalized MSAC score (higher is better),
      inlier_counts [B] int32,
      pref_dot [B]: <pref_b, compound_pref>,
      pref_sqnorm [B]: <pref_b, pref_b>
    (the last two are the Tanimoto moments of every hypothesis against the
    compound instance, progressive_x.h:583-585).
    """
    pref = truncated_preference(sq_residuals, truncated_sq_threshold)
    pref = jnp.where(point_mask[None, :], pref, 0.0)
    if magsac_levels > 0:
        rank_pref = sigma_marginalized_preference(
            sq_residuals, truncated_sq_threshold, magsac_levels
        )
        rank_pref = jnp.where(point_mask[None, :], rank_pref, 0.0)
    else:
        rank_pref = pref
    raw = jnp.sum(rank_pref, axis=-1)
    # The overlap penalty stays on the reference's hard-tau preference in
    # BOTH operands (scoring_function_with_compound_model.h:109-121): the
    # compound preference is defined with it, and a mixed min() would
    # under-count shared support.
    shared = jnp.sum(jnp.minimum(pref, compound_pref[None, :]), axis=-1)
    # shared^e with e possibly fractional; shared >= 0 by construction.
    penalty = jnp.power(jnp.maximum(shared, 0.0), exponent)
    scores = jnp.where(has_compound, raw - penalty, raw)
    # Inlier COUNTS use the raw threshold tau^2, not the 2.25x truncated
    # one: the reference validates proposals against GC-RANSAC's inlier
    # list at tau (progressive_x.h:571-575), and counting at the truncated
    # threshold admits ~1.5x looser marginal models that the reference
    # would reject.
    inliers = jnp.sum(
        (sq_residuals < truncated_sq_threshold / 2.25) & point_mask[None, :],
        axis=-1,
    ).astype(jnp.int32)
    pref_dot = pref @ compound_pref
    pref_sqnorm = jnp.sum(pref * pref, axis=-1)
    return scores, inliers, pref_dot, pref_sqnorm


def tanimoto_similarity(pref, compound_pref):
    """Tanimoto similarity of two preference vectors
    (reference progressive_x.h:583-585)."""
    dot = jnp.sum(pref * compound_pref)
    denom = jnp.sum(pref * pref) + jnp.sum(compound_pref * compound_pref) - dot
    return jnp.where(denom > 1e-12, dot / jnp.maximum(denom, 1e-12), 0.0)
