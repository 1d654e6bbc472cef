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


def compound_penalized_scores(
    sq_residuals,  # [B, N]
    compound_pref,  # [N]
    point_mask,  # [N] bool (False for padding)
    truncated_sq_threshold,  # scalar
    exponent,  # scalar (scoring_exponent kwarg)
    has_compound,  # scalar bool: any model in the compound instance yet?
):
    """Score every hypothesis against the data and the compound instance.

    Returns:
      scores [B]: penalized MSAC score (higher is better),
      inlier_counts [B] int32,
      pref [B, N]: the truncated-quadratic preference matrix.
    """
    pref = truncated_preference(sq_residuals, truncated_sq_threshold)
    pref = jnp.where(point_mask[None, :], pref, 0.0)
    raw = jnp.sum(pref, axis=-1)
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
    return scores, inliers, pref


def tanimoto_similarity(pref, compound_pref):
    """Tanimoto similarity of two preference vectors
    (reference progressive_x.h:583-585)."""
    dot = jnp.sum(pref * compound_pref)
    denom = jnp.sum(pref * pref) + jnp.sum(compound_pref * compound_pref) - dot
    return jnp.where(denom > 1e-12, dot / jnp.maximum(denom, 1e-12), 0.0)
