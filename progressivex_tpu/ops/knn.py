"""Fixed-degree k-nearest-neighbor graph — the XLA-friendly stand-in for the
reference's FLANN ball-radius graph (`/root/reference/src/pyprogressivex/src/
progressivex_python.cpp:104-105,207-208`).

The reference builds a kd-tree and returns variable-length neighbor lists;
on TPU we want a dense [N, K] index tensor with a validity mask, computed as
one pairwise-distance matmul + top_k. Edges are additionally gated by the
ball radius so the Potts term sees the same neighborhood semantics (degree
capped at K).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def knn_graph(points, valid_mask, radius, k: int):
    """Build a radius-gated kNN graph.

    Args:
      points: [N, D] data rows (the same coordinates the reference feeds to
        FLANN — full joint rows for correspondences).
      valid_mask: [N] bool, False for padding rows.
      radius: scalar neighborhood ball radius.
      k: static neighbor count.

    Returns:
      (idx [N, k] int32, mask [N, k] bool) — mask is False for padded points,
      self-edges beyond the ball radius, or out-of-radius neighbors.
    """
    n = points.shape[0]
    # Pairwise squared distances via the |a|^2 + |b|^2 - 2ab expansion (MXU).
    sq = jnp.sum(points * points, axis=-1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * (points @ points.T)
    d2 = jnp.maximum(d2, 0.0)
    # Mask self and invalid points with +inf so no finite user radius can
    # ever re-admit them through the radius gate below.
    eye = jnp.eye(n, dtype=bool)
    invalid = ~(valid_mask[None, :] & valid_mask[:, None])
    d2 = jnp.where(eye | invalid, jnp.inf, d2)
    neg_d2, idx = lax.top_k(-d2, k)
    d2k = -neg_d2
    mask = (d2k <= radius * radius) & valid_mask[:, None]
    return idx.astype(jnp.int32), mask
