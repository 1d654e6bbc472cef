"""Point-to-instance labeling by parallel ICM over the kNN graph.

This is the TPU-native replacement for gco alpha-expansion inside PEARL
(`/root/reference/src/pyprogressivex/include/PEARL.h:476-555`). The energy is
the same (SURVEY.md §2.1 "PEARL energy"):

  E = sum_i data(i, l_i) + w * sum_{(i,j) in E} [l_i != l_j]  (+ label costs)

with data costs from `PEARL.h:82-128`:
  * outlier label:            (1 - w)
  * assigned, r^2 >  tau_t^2: 2 (1 - w)
  * assigned, r^2 <= tau_t^2: (1 - w) * r^2 / tau_t^2

Alpha-expansion performs serial graph cuts; on TPU we instead run
checkerboard ICM: every sweep computes, for ALL points and ALL labels, the
local cost (data + Potts against the current neighbor labels) and moves
half of the points (even, then odd index parity) to their argmin label.
Two half-sweeps touch every point once and avoid the worst of
synchronous-Jacobi oscillation. Note index parity is NOT a valid 2-coloring
of the kNN graph (same-parity neighbors can move simultaneously), so strict
per-half-sweep energy descent is not guaranteed — the sweep count is
bounded and the caller keeps the energy for convergence decisions instead
of relying on monotonicity.

Layout note: every [label, point] tensor is [L, N] with points on the
128-lane axis — L is tiny (max_models + 1 ≈ 11) and would waste >90% of
each vector register if it sat in lanes. The Potts neighbor count is a
static unrolled loop over L of [N, k] compares, all lane-parallel over N.

Label-cost handling differs by design: GCO charges `minimum_inlier_number`
per label in use (`PEARL.h:528-529`); here weak instances are removed by
the explicit label-cost elimination + rejection steps in PEARL
(core/pearl.py), which has the same fixed point.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

_INF = 1e18


def data_costs(sq_residuals, active, point_mask, spatial_weight, trunc_sq):
    """Per-(label, point) data cost tensor [L, N]; label L-1 = outlier.

    Args:
      sq_residuals: [K, N] squared residuals of every slot's model.
      active: [K] bool slot mask.
      point_mask: [N] bool (False = padding).
      spatial_weight: scalar w.
      trunc_sq: scalar truncated squared threshold.

    Padded points get 0 for the outlier label and INF elsewhere, so they
    pin to the outlier class and never influence real costs.
    """
    one_minus_w = 1.0 - spatial_weight
    ratio = sq_residuals / trunc_sq  # [K, N]
    model_cost = jnp.where(ratio > 1.0, 2.0 * one_minus_w, one_minus_w * ratio)
    model_cost = jnp.where(active[:, None], model_cost, _INF)  # [K, N]
    n = sq_residuals.shape[1]
    outlier = jnp.full((1, n), one_minus_w, model_cost.dtype)
    costs = jnp.concatenate([model_cost, outlier], axis=0)  # [L, N]
    pad_col = jnp.concatenate(
        [jnp.full((model_cost.shape[0], n), _INF), jnp.zeros((1, n))], axis=0
    )
    return jnp.where(point_mask[None, :], costs, pad_col)


def _neighbor_same_counts(labels, knn_idx, knn_mask, num_labels: int):
    """[L, N]: for each label l and point n, how many of n's valid
    neighbors currently carry label l. Static unrolled loop over the tiny
    L axis keeps every op [N, k]-shaped (points on lanes)."""
    nb_labels = labels[knn_idx]  # [N, k]
    rows = []
    for l in range(num_labels):
        rows.append(jnp.sum((nb_labels == l) & knn_mask, axis=1))
    return jnp.stack(rows).astype(jnp.float32)  # [L, N]


def _local_costs(dcost, labels, knn_idx, knn_mask, spatial_weight):
    """dcost + Potts term against the current neighbor labels. [L, N]."""
    num_labels = dcost.shape[0]
    same = _neighbor_same_counts(labels, knn_idx, knn_mask, num_labels)
    deg = jnp.sum(knn_mask, axis=1).astype(dcost.dtype)  # [N]
    potts = spatial_weight * (deg[None, :] - same)
    return dcost + potts


def icm_sweeps(dcost, labels, knn_idx, knn_mask, spatial_weight, n_sweeps: int):
    """Run n_sweeps checkerboard ICM sweeps; returns (labels, energy).

    When spatial_weight == 0 this reduces to the argmin over data costs
    (exactly the reference behavior of a Potts-free labeling).
    """
    n = dcost.shape[1]
    parity = (jnp.arange(n) % 2).astype(bool)

    def half_sweep(labels, move_mask):
        costs = _local_costs(dcost, labels, knn_idx, knn_mask, spatial_weight)
        best = jnp.argmin(costs, axis=0).astype(labels.dtype)
        return jnp.where(move_mask, best, labels)

    def sweep(labels, _):
        labels = half_sweep(labels, parity)
        labels = half_sweep(labels, ~parity)
        return labels, None

    labels, _ = lax.scan(sweep, labels, None, length=n_sweeps)
    energy = labeling_energy(dcost, labels, knn_idx, knn_mask, spatial_weight)
    return labels, energy


def labeling_energy(dcost, labels, knn_idx, knn_mask, spatial_weight):
    """Total energy of a labeling (for convergence tests and logging)."""
    data = jnp.sum(jnp.take_along_axis(dcost, labels[None, :], axis=0))
    nb_labels = labels[knn_idx]
    diff = (nb_labels != labels[:, None]) & knn_mask
    # Directed-edge count, matching the reference's double-registration of
    # symmetric FLANN edges in GCO (PEARL.h:532-536).
    potts = spatial_weight * jnp.sum(diff)
    return data + potts
