"""PEARL: alternating labeling / per-instance refit / weak-instance rejection.

TPU-native counterpart of `pearl::PEARL::run`
(`/root/reference/src/pyprogressivex/include/PEARL.h:405-472`):

  while not converged (fixed trip count here):
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
    knn_idx,  # [N, k] neighbor indices
    knn_mask,  # [N, k] neighbor validity
) -> PearlResult:
    k_slots = cfg.max_models
    outlier_label = jnp.int32(k_slots)
    trunc_sq = truncated_sq_threshold(params.threshold)
    w = params.spatial_weight

    # Remap labels of now-inactive slots to the outlier class.
    def sanitize(labels, active):
        lbl_active = jnp.concatenate([active, jnp.array([True])])[labels]
        return jnp.where(lbl_active, labels, outlier_label)

    def residual_matrix(descs):
        return jax.vmap(family.squared_residual, in_axes=(None, 0))(data, descs)

    def iteration(carry, _):
        descs, active, labels = carry

        # --- 1. labeling ---
        r2 = residual_matrix(descs)  # [K, N]
        dcost = labeling_ops.data_costs(r2, active, point_mask, w, trunc_sq)
        # Initialize from the per-point data argmin rather than the previous
        # labeling: parallel ICM cannot flip a whole cluster over the Potts
        # barrier the way an expansion move (global min-cut) can, so a warm
        # start would freeze newly added instances out of the labeling.
        # The argmin start hands each instance its data-supported points and
        # the sweeps then enforce spatial coherence at the boundaries.
        init = jnp.argmin(dcost, axis=0).astype(jnp.int32)
        labels, energy = labeling_ops.icm_sweeps(
            dcost, init, knn_idx, knn_mask, w, cfg.icm_sweeps
        )

        # --- 2. per-instance refit (vmapped over slots) ---
        onehot = (labels[:, None] == jnp.arange(k_slots)[None, :]) & point_mask[
            :, None
        ]  # [N, K]
        counts = jnp.sum(onehot, axis=0)  # [K]
        fit_w = onehot.T.astype(data.dtype) * point_weights[None, :]  # [K, N]
        new_descs, fit_ok = jax.vmap(family.refit, in_axes=(None, 0, 0))(
            data, fit_w, descs
        )
        res_before = jnp.sum(onehot.T * jnp.sqrt(r2), axis=1)
        r2_new = residual_matrix(new_descs)
        res_after = jnp.sum(onehot.T * jnp.sqrt(r2_new), axis=1)
        accept = (
            fit_ok
            & active
            & (counts >= family.nonminimal_min)
            & (res_after < res_before)
        )
        descs = jnp.where(accept[:, None], new_descs, descs)

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
        dcost2 = labeling_ops.data_costs(
            residual_matrix(descs), active, point_mask, w, trunc_sq
        )
        n_pts = labels.shape[0]
        chosen = jnp.take_along_axis(dcost2, labels[None, :], axis=0)[0]
        excl = dcost2.at[labels, jnp.arange(n_pts)].set(1e18)
        alt = jnp.min(excl, axis=0)
        point_gain = jnp.where(point_mask, alt - chosen, 0.0)
        # Keeping a label also pays the Potts cost of its boundary: a
        # scattered phantom instance has mismatching neighbors everywhere
        # (large cut), a compact real structure only at its perimeter.
        # Deleting the label recovers ~2*w*cut (both edge directions).
        nb_labels = labels[knn_idx]
        mismatch = jnp.sum(
            (nb_labels != labels[:, None]) & knn_mask, axis=1
        ).astype(point_gain.dtype)
        point_gain = point_gain - 2.0 * w * jnp.where(point_mask, mismatch, 0.0)
        onehot2 = labels[:, None] == jnp.arange(k_slots)[None, :]
        gains = jnp.sum(jnp.where(onehot2, point_gain[:, None], 0.0), axis=0)
        gains = jnp.where(active, gains, jnp.inf)
        weakest = jnp.argmin(gains)
        label_cost = params.min_inliers.astype(gains.dtype)
        do_delete = gains[weakest] < label_cost
        active = active & ~(do_delete & (jnp.arange(k_slots) == weakest))

        counts2 = jnp.sum(
            ((labels[:, None] == jnp.arange(k_slots)[None, :]) & point_mask[:, None]),
            axis=0,
        )
        active = active & (counts2 >= params.min_inliers)

        # Re-assign points of removed instances by data argmin.
        dcost3 = labeling_ops.data_costs(
            residual_matrix(descs), active, point_mask, w, trunc_sq
        )
        labels = jnp.where(
            jnp.concatenate([active, jnp.array([True])])[labels],
            labels,
            jnp.argmin(dcost3, axis=0).astype(labels.dtype),
        )

        return (descs, active, labels), energy

    labels = sanitize(labels, active)
    (descs, active, labels), energies = lax.scan(
        iteration, (descs, active, labels), None, length=cfg.pearl_iters
    )
    return PearlResult(descs, active, labels, energies[-1])
