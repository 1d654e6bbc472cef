"""Fixed-degree k-nearest-neighbor graph — the XLA-friendly stand-in for the
reference's FLANN ball-radius graph (`/root/reference/src/pyprogressivex/src/
progressivex_python.cpp:104-105,207-208`).

The reference builds a kd-tree and returns variable-length neighbor lists;
on TPU we want a dense [N, K] index tensor with a validity mask, computed as
pairwise-distance matmuls + top_k. Edges are additionally gated by the ball
radius so the Potts term sees the same neighborhood semantics (degree capped
at K).

Memory note: the distance matrix is computed in ROW CHUNKS (lax.map), never
materializing the full [N, N] f32 matrix. Per chunk the live tensor is
[chunk, N]; under a scene-vmap that becomes [B, chunk, N] — this is what
lets hundreds of padded scenes batch on one chip (a dense [B, N, N] f32
matrix at B=192, N=2176 is ~3.6 GB before top_k workspace, and was the
round-1 device-OOM at >24 scenes).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def knn_graph(points, valid_mask, radius, k: int, chunk: int = 256):
    """Build a radius-gated kNN graph.

    Args:
      points: [N, D] data rows (the same coordinates the reference feeds to
        FLANN — full joint rows for correspondences).
      valid_mask: [N] bool, False for padding rows.
      radius: scalar neighborhood ball radius.
      k: static neighbor count.
      chunk: row-chunk size for the pairwise-distance computation.

    Returns:
      (idx [N, k] int32, mask [N, k] bool) — mask is False for padded points
      or out-of-radius neighbors; self-edges are always masked.
    """
    n = points.shape[0]
    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)
    # Pad the QUERY rows to a whole number of chunks: lax.dynamic_slice
    # CLAMPS an out-of-bounds start, so without padding the last chunk of
    # a non-multiple N silently re-reads earlier rows while labeling them
    # as the tail rows — corrupting the tail's neighbor lists.
    n_rows = n_chunks * chunk
    if n_rows != n:
        points_q = jnp.pad(points, ((0, n_rows - n), (0, 0)))
    else:
        points_q = points
    sq = jnp.sum(points * points, axis=-1)  # [N]
    sq_q = jnp.sum(points_q * points_q, axis=-1)

    def one_chunk(c):
        rows = lax.dynamic_slice(
            points_q, (c * chunk, 0), (chunk, points_q.shape[1])
        )
        row_sq = lax.dynamic_slice(sq_q, (c * chunk,), (chunk,))
        # |a|^2 + |b|^2 - 2ab via one [chunk, N] matmul (MXU).
        d2 = row_sq[:, None] + sq[None, :] - 2.0 * (rows @ points.T)
        d2 = jnp.maximum(d2, 0.0)
        # Mask self-edges and invalid points with a huge finite sentinel
        # (approx_max_k mishandles inf/nan tie-breaking on some backends);
        # larger than any radius^2 a user can pass, so the radius gate
        # below always rejects them.
        row_ids = c * chunk + jnp.arange(chunk)
        self_edge = row_ids[:, None] == jnp.arange(n)[None, :]
        invalid = self_edge | ~valid_mask[None, :]
        d2 = jnp.where(invalid, 3.4e38, d2)
        # approx_max_k uses the TPU's native approximate top-k (measured
        # 3.4x faster than the full sort of lax.top_k at this shape); a
        # ~0.9-recall neighbor list is indistinguishable for a heuristic
        # spatial-coherence graph, and the lower recall target shrinks the
        # pre-sort reduction width (the top-k sort was ~10% of a whole
        # large-scene fit at the 0.95 default).
        neg_d2, idx = lax.approx_max_k(-d2, k, recall_target=0.9)
        return idx.astype(jnp.int32), -neg_d2

    idx_c, d2_c = lax.map(one_chunk, jnp.arange(n_chunks))
    idx = idx_c.reshape(n_chunks * chunk, k)[:n]
    d2k = d2_c.reshape(n_chunks * chunk, k)[:n]
    mask = (d2k <= radius * radius) & valid_mask[:, None]
    return idx, mask


def grid_graph(points, valid_mask, cell_size, k: int, chunk: int = 256):
    """Grid-cell neighborhood graph: two points are neighbors iff they
    fall in the SAME axis-aligned grid cell of width `cell_size` per
    dimension — the TPU counterpart of the reference's
    GridNeighborhoodGraph (`neighborhood/grid_neighborhood_graph.h`,
    included by `progressivex_python.cpp:15` though the reference's
    Python front ends always instantiate the FLANN ball graph instead).

    Same contract as knn_graph: returns (idx [N, k] int32, mask [N, k]
    bool), at most k same-cell neighbors per point (the k NEAREST
    in-cell, so a degree-capped cell keeps its tightest cluster),
    self-edges masked. Cell ids hash each dimension's cell coordinate
    with large primes under int32 wraparound; for a scene's few thousand
    points the collision probability is ~n^2/2^33 < 1e-3, and a
    collision only adds spurious Potts edges between two cells.
    """
    n, d = points.shape
    cells = jnp.floor(points / cell_size).astype(jnp.int32)
    primes = jnp.array(
        [73856093, 19349663, 83492791, 32452843, 87382121][:d],
        jnp.int32)
    cid = jnp.sum(cells * primes[None, :], axis=1)

    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)
    n_rows = n_chunks * chunk
    points_q = (jnp.pad(points, ((0, n_rows - n), (0, 0)))
                if n_rows != n else points)
    cid_q = jnp.pad(cid, (0, n_rows - n)) if n_rows != n else cid
    sq = jnp.sum(points * points, axis=-1)
    sq_q = jnp.sum(points_q * points_q, axis=-1)

    def one_chunk(c):
        rows = lax.dynamic_slice(
            points_q, (c * chunk, 0), (chunk, points_q.shape[1]))
        row_sq = lax.dynamic_slice(sq_q, (c * chunk,), (chunk,))
        row_cid = lax.dynamic_slice(cid_q, (c * chunk,), (chunk,))
        d2 = row_sq[:, None] + sq[None, :] - 2.0 * (rows @ points.T)
        d2 = jnp.maximum(d2, 0.0)
        row_ids = c * chunk + jnp.arange(chunk)
        self_edge = row_ids[:, None] == jnp.arange(n)[None, :]
        same = row_cid[:, None] == cid[None, :]
        bad = self_edge | ~valid_mask[None, :] | ~same
        d2 = jnp.where(bad, 3.4e38, d2)
        neg_d2, idx = lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg_d2

    idx_c, d2_c = lax.map(one_chunk, jnp.arange(n_chunks))
    idx = idx_c.reshape(n_rows, k)[:n]
    d2k = d2_c.reshape(n_rows, k)[:n]
    mask = (d2k < 3.4e38) & valid_mask[:, None]
    return idx, mask
