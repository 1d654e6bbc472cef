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

Hardware note — why a dense adjacency MATMUL and not a gather: the Potts
term needs, per point, a histogram of its neighbors' labels. The obvious
`labels[knn_idx]` gather lowers to TPU gather instructions that cost
milliseconds per sweep at N ~ 2k (measured ~7 ms vs ~0.1 ms for the whole
rest of the sweep); TPUs move irregular data through the MXU instead. With
the (static per fit) one-hot adjacency A [N, N] and the one-hot labeling
Y [N, L], the full histogram for every point and every label is one
A @ Y matmul in bf16 with f32 accumulation — exact (counts <= k << 256) and
two orders of magnitude faster. A is built once per scene and reused by
every sweep of every PEARL call of every round.

Layout note: every [label, point] tensor is [L, N] with points on the
128-lane axis — L is tiny (max_models + 1 ~ 11) and would waste >90% of
each vector register if it sat in lanes.

Label-cost handling differs by design: GCO charges `minimum_inlier_number`
per label in use (`PEARL.h:528-529`); here weak instances are removed by
the explicit label-cost elimination + rejection steps in PEARL
(core/pearl.py), which has the same fixed point.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

_INF = 1e18


class BandedAdj(NamedTuple):
    """Block-banded one-hot adjacency.

    Valid when the point order is SPATIALLY SORTED (the engine sorts each
    scene along its principal axis): a point's kNN neighbors then lie
    within a +-W window of its index (measured 97-99% edge recall at
    W=192 on the AdelaideRMF scenes), so the [N, N] dense adjacency
    collapses to [N, 2W] — every Potts histogram reads 4-6x less HBM,
    which is all an int8 adjacency matmul is bound by.

    blocks[b, r, c] = 1 iff point j = 128 b + c - W is a neighbor of
    point i = 128 b + r (c in [0, 128 + 2W)).
    """

    blocks: jnp.ndarray  # [nb, 128, 128 + 2W] int8/f32
    deg: jnp.ndarray  # [N] f32 row degrees

    @property
    def n(self):
        return self.deg.shape[0]


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


def _adj_dtype():
    """int8 on TPU: every Potts histogram is an adj @ one-hot matmul whose
    cost is HBM-bound on reading A, and the MXU's s8 x s8 -> s32 path is
    both exact (counts <= k) and ~1.75x faster than bf16 at this shape
    (measured). The CPU backend used in tests lacks the narrow dot
    kernels, so plain f32 there."""
    return jnp.int8 if jax.default_backend() == "tpu" else jnp.float32


def adjacency_from_knn(knn_idx, knn_mask, chunk: int = 512):
    """Dense one-hot adjacency A [N, N] from a padded kNN graph.

    A[i, j] = 1 iff j is a valid kNN neighbor of i (directed, matching the
    per-point neighbor lists the reference hands to GCO, PEARL.h:532-536).
    Built in row chunks so the [C, k, N] one-hot transient stays small.
    """
    n, k = knn_idx.shape
    dt = _adj_dtype()
    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)
    # Pad rows to a whole number of chunks — dynamic_slice clamps an
    # out-of-bounds start, which would silently duplicate earlier rows
    # into the tail (see ops/knn.knn_graph).
    n_rows = n_chunks * chunk
    idx_p = jnp.pad(knn_idx, ((0, n_rows - n), (0, 0)))
    mask_p = jnp.pad(knn_mask, ((0, n_rows - n), (0, 0)))

    def one_chunk(c):
        rows = lax.dynamic_slice(idx_p, (c * chunk, 0), (chunk, k))
        mask = lax.dynamic_slice(mask_p, (c * chunk, 0), (chunk, k))
        oh = jax.nn.one_hot(rows, n, dtype=dt)  # [C, k, N]
        return jnp.einsum("ckn,ck->cn", oh, mask.astype(dt))

    A = lax.map(one_chunk, jnp.arange(n_chunks))  # [n_chunks, C, N]
    return A.reshape(n_rows, n)[:n]


def adjacency_banded(knn_idx, knn_mask, half_width: int, block: int = 128,
                     chunk: int = 512):
    """Build a BandedAdj from a padded kNN graph over spatially-sorted
    points. Edges falling outside the +-half_width window are dropped
    (2-3% at the engine's default on the benchmark scenes — comparable to
    the approximate top-k recall the graph is built with)."""
    n, k = knn_idx.shape
    dt = _adj_dtype()
    w = half_width
    ctx = block + 2 * w
    nb = -(-n // block)
    n_pad = nb * block
    chunk = min(chunk, n)
    n_chunks = -(-n // chunk)
    # Row padding to a whole number of chunks (dynamic_slice clamps
    # out-of-bounds starts — see adjacency_from_knn).
    n_rows = n_chunks * chunk
    idx_p = jnp.pad(knn_idx, ((0, n_rows - n), (0, 0)))
    mask_p = jnp.pad(knn_mask, ((0, n_rows - n), (0, 0)))

    def one_chunk(cidx):
        i0 = cidx * chunk
        idx = lax.dynamic_slice(idx_p, (i0, 0), (chunk, k))
        msk = lax.dynamic_slice(mask_p, (i0, 0), (chunk, k))
        i = i0 + jnp.arange(chunk)
        r = i % block
        c = idx - (i - r)[:, None] + w  # [C, k]
        inband = (c >= 0) & (c < ctx) & msk
        oh = jax.nn.one_hot(jnp.where(inband, c, 0), ctx, dtype=dt)
        rows = jnp.einsum("nkc,nk->nc", oh, inband.astype(dt))  # [C, ctx]
        return rows, jnp.sum(inband, axis=1).astype(jnp.float32)

    rows_c, deg_c = lax.map(one_chunk, jnp.arange(n_chunks))
    rows = rows_c.reshape(n_chunks * chunk, ctx)[:n]
    deg = deg_c.reshape(n_chunks * chunk)[:n]
    rows = jnp.pad(rows, ((0, n_pad - n), (0, 0)))
    return BandedAdj(blocks=rows.reshape(nb, block, ctx), deg=deg)


def _banded_matmul(adj: BandedAdj, Y):
    """Banded A @ Y. Y: [N, L] (same dtype as adj.blocks) -> [N, L] f32/i32."""
    nb, block, ctx = adj.blocks.shape
    w = (ctx - block) // 2
    n, l = Y.shape
    acc = jnp.int32 if adj.blocks.dtype == jnp.int8 else jnp.float32
    yp = jnp.pad(Y, ((w, nb * block - n + w), (0, 0)))
    slabs = jnp.stack(
        [lax.slice_in_dim(yp, b * block, b * block + ctx) for b in range(nb)]
    )  # [nb, ctx, L]
    out = jnp.einsum(
        "brc,bcl->brl", adj.blocks, slabs, preferred_element_type=acc
    )
    return out.reshape(nb * block, l)[:n]


def degrees(adj):
    """[N] f32 neighbor counts for either adjacency representation."""
    if isinstance(adj, BandedAdj):
        return adj.deg
    return jnp.sum(adj.astype(jnp.float32), axis=1)


def neighbor_label_counts(adj, labels, num_labels: int):
    """[L, N]: for each label l and point n, how many of n's neighbors
    currently carry label l — one adjacency matmul on the MXU."""
    if isinstance(adj, BandedAdj):
        Y = jax.nn.one_hot(labels, num_labels, dtype=adj.blocks.dtype)
        return _banded_matmul(adj, Y).astype(jnp.float32).T  # [L, N]
    Y = jax.nn.one_hot(labels, num_labels, dtype=adj.dtype)  # [N, L]
    acc = jnp.int32 if adj.dtype == jnp.int8 else jnp.float32
    counts = jnp.matmul(adj, Y, preferred_element_type=acc)
    return counts.astype(jnp.float32).T  # [L, N]


def neighbor_mean(adj, values):
    """Mean of `values` over each point's neighbors: (A @ v) / deg, [N].

    With an int8 adjacency the float payload is quantized to int8 (values
    must lie in [0, 1]; ~1% quantization error, irrelevant for IRLS
    weights) so the matvec stays on the fast integer MXU path.
    """
    deg = jnp.maximum(degrees(adj), 1.0)
    if isinstance(adj, BandedAdj):
        if adj.blocks.dtype == jnp.int8:
            q = jnp.clip(jnp.round(values * 127.0), 0, 127).astype(jnp.int8)
            s = _banded_matmul(adj, q[:, None])[:, 0]
            return s.astype(jnp.float32) / (127.0 * deg)
        s = _banded_matmul(adj, values.astype(adj.blocks.dtype)[:, None])[:, 0]
        return s.astype(jnp.float32) / deg
    if adj.dtype == jnp.int8:
        q = jnp.clip(jnp.round(values * 127.0), 0, 127).astype(jnp.int8)
        s = jnp.matmul(adj, q, preferred_element_type=jnp.int32)
        return s.astype(jnp.float32) / (127.0 * deg)
    s = jnp.matmul(adj, values.astype(adj.dtype), preferred_element_type=jnp.float32)
    return s.astype(jnp.float32) / deg


def labels_active_mask(labels, active):
    """[N] bool: does each point's label refer to an active slot (or the
    outlier class)? One-hot compare + any-reduce — never a gather (see
    labeling_energy's hardware note); `active` is the [K] slot mask and
    label K (= len(active)) is the always-valid outlier class."""
    act_ext = jnp.concatenate([active, jnp.ones((1,), bool)])
    oh = labels[None, :] == jnp.arange(act_ext.shape[0])[:, None]  # [L, N]
    return jnp.any(oh & act_ext[:, None], axis=0)


def _local_costs(dcost, labels, adj, deg, spatial_weight):
    """dcost + Potts term against the current neighbor labels. [L, N]."""
    same = neighbor_label_counts(adj, labels, dcost.shape[0])
    potts = spatial_weight * (deg[None, :] - same)
    return dcost + potts


def icm_sweeps(dcost, labels, adj, spatial_weight, n_sweeps: int,
               unroll: bool = False):
    """Run up to n_sweeps checkerboard ICM sweeps with change detection;
    returns (labels, energy).

    The loop exits as soon as a full sweep moves no point — the analog of
    alpha-expansion running to convergence (`PEARL.h:549-551` caps sweeps,
    gco stops when no move helps). Under `vmap` the while_loop runs until
    every lane converges and applies masked updates, so a batch of scenes
    pays the DEEPEST scene's sweep count, not n_sweeps, per labeling call.

    `unroll=True` replaces the while_loop with n_sweeps predicated steps
    (a converged labeling carries through unchanged) — semantically
    identical, but one less loop level for the TPU backend's
    memory-space-assignment pass, which dominates cold compiles of the
    deeply nested fit program (see EngineConfig.unroll_icm).

    When spatial_weight == 0 this reduces to the argmin over data costs
    (exactly the reference behavior of a Potts-free labeling) and exits
    after the first sweep.
    """
    n = dcost.shape[1]
    parity = (jnp.arange(n) % 2).astype(bool)
    deg = degrees(adj)

    def half_sweep(labels, move_mask):
        costs = _local_costs(dcost, labels, adj, deg, spatial_weight)
        best = jnp.argmin(costs, axis=0).astype(labels.dtype)
        return jnp.where(move_mask, best, labels)

    def cond(carry):
        _, changed, sweep = carry
        return changed & (sweep < n_sweeps)

    def body(carry):
        labels, _, sweep = carry
        new = half_sweep(labels, parity)
        new = half_sweep(new, ~parity)
        return new, jnp.any(new != labels), sweep + 1

    if unroll:
        carry = (labels, jnp.ones((), bool), jnp.int32(0))
        for _ in range(n_sweeps):
            new = body(carry)
            keep = carry[1]
            carry = (jnp.where(keep, new[0], carry[0]),
                     keep & new[1], new[2])
        labels = carry[0]
    else:
        labels, _, _ = lax.while_loop(
            cond, body, (labels, jnp.ones((), bool), jnp.int32(0))
        )
    energy = labeling_energy(dcost, labels, adj, spatial_weight)
    return labels, energy


def labeling_energy(dcost, labels, adj, spatial_weight):
    """Total energy of a labeling (for convergence tests and logging).

    Per-point label selection is a one-hot multiply-reduce over the tiny
    label axis, not a take_along_axis: an [N]-element gather lowers to TPU
    gather instructions (measured ~2 ms per call at N~2k under a 96-scene
    vmap — one of the largest single line items of the whole fit), while
    the masked reduce is a trivial [L, N] elementwise op.
    """
    num_labels = dcost.shape[0]
    own_oh = labels[None, :] == jnp.arange(num_labels)[:, None]  # [L, N]
    data = jnp.sum(jnp.where(own_oh, dcost, 0.0))
    same = neighbor_label_counts(adj, labels, num_labels)  # [L, N]
    own = jnp.sum(jnp.where(own_oh, same, 0.0), axis=0)  # [N]
    deg = degrees(adj)
    # Directed-edge mismatch count, matching the reference's
    # double-registration of symmetric FLANN edges in GCO (PEARL.h:532-536).
    potts = spatial_weight * jnp.sum(deg - own)
    return data + potts
