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
local cost (data + Potts against the current neighbor labels) as one dense
[N, L] tensor and moves half of the points (even, then odd index parity) to
their argmin label. Two half-sweeps touch every point once and avoid the
synchronous-Jacobi oscillation. Each sweep monotonically decreases the
energy restricted to the moved half; the PEARL alternation supplies the
convergence pressure the reference gets from expansion moves.

Label-cost handling differs by design: GCO charges `minimum_inlier_number`
per label in use (`PEARL.h:528-529`); here weak instances are removed by the
explicit rejection step in PEARL (`PEARL.h:275-315` analog), which has the
same fixed point (no instance with < min inliers survives).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_INF = 1e18


def data_costs(sq_residuals, active, point_mask, spatial_weight, trunc_sq):
    """Per-(point, label) data cost tensor, label L = K is the outlier class.

    Args:
      sq_residuals: [K, N] squared residuals of every slot's model.
      active: [K] bool slot mask.
      point_mask: [N] bool (False = padding).
      spatial_weight: scalar w.
      trunc_sq: scalar truncated squared threshold.

    Returns:
      [N, K+1] costs; padded points get 0 for the outlier and INF elsewhere,
      so they pin to the outlier label and never influence real costs.
    """
    one_minus_w = 1.0 - spatial_weight
    ratio = sq_residuals / trunc_sq  # [K, N]
    model_cost = jnp.where(ratio > 1.0, 2.0 * one_minus_w, one_minus_w * ratio)
    model_cost = jnp.where(active[:, None], model_cost, _INF).T  # [N, K]
    n = sq_residuals.shape[1]
    outlier = jnp.full((n, 1), one_minus_w, model_cost.dtype)
    costs = jnp.concatenate([model_cost, outlier], axis=1)  # [N, K+1]
    pad_row = jnp.concatenate(
        [jnp.full((n, model_cost.shape[1]), _INF), jnp.zeros((n, 1))], axis=1
    )
    return jnp.where(point_mask[:, None], costs, pad_row)


def _local_costs(dcost, labels, knn_idx, knn_mask, spatial_weight):
    """dcost + Potts term against the current neighbor labels. [N, L]."""
    n, num_labels = dcost.shape
    nb_labels = labels[knn_idx]  # [N, k]
    nb_onehot = jax.nn.one_hot(nb_labels, num_labels, dtype=dcost.dtype)
    nb_onehot = nb_onehot * knn_mask[..., None]
    same = jnp.sum(nb_onehot, axis=1)  # [N, L] neighbors sharing each label
    deg = jnp.sum(knn_mask, axis=1, dtype=dcost.dtype)  # [N]
    potts = spatial_weight * (deg[:, None] - same)
    return dcost + potts


def icm_sweeps(dcost, labels, knn_idx, knn_mask, spatial_weight, n_sweeps: int):
    """Run n_sweeps checkerboard ICM sweeps; returns (labels, energy).

    When spatial_weight == 0 this reduces to a single argmin over the data
    costs (exactly the reference behavior of a Potts-free alpha-expansion).
    """
    n = dcost.shape[0]
    parity = (jnp.arange(n) % 2).astype(bool)

    def half_sweep(labels, move_mask):
        costs = _local_costs(dcost, labels, knn_idx, knn_mask, spatial_weight)
        best = jnp.argmin(costs, axis=1).astype(labels.dtype)
        return jnp.where(move_mask, best, labels)

    def sweep(labels, _):
        labels = half_sweep(labels, parity)
        labels = half_sweep(labels, ~parity)
        return labels, None

    # Pure data-term argmin start keeps w=0 exact in one shot; with w>0 the
    # warm-start labels seed the Potts term of the first half-sweep.
    labels, _ = lax.scan(sweep, labels, None, length=n_sweeps)
    energy = labeling_energy(dcost, labels, knn_idx, knn_mask, spatial_weight)
    return labels, energy


def labeling_energy(dcost, labels, knn_idx, knn_mask, spatial_weight):
    """Total energy of a labeling (for convergence tests and logging)."""
    n = dcost.shape[0]
    data = jnp.sum(jnp.take_along_axis(dcost, labels[:, None], axis=1))
    nb_labels = labels[knn_idx]
    diff = (nb_labels != labels[:, None]) & knn_mask
    # Directed-edge count, matching the reference's double-registration of
    # symmetric FLANN edges in GCO (PEARL.h:532-536).
    potts = spatial_weight * jnp.sum(diff)
    return data + potts
