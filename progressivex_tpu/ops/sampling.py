"""Batched minimal-sample generation.

The reference draws ONE minimal sample per RANSAC iteration from a stateful
sampler object (`gcransac::sampler::*`, consumed at
`/root/reference/src/pyprogressivex/src/progressivex_python.cpp:215-245`).
The TPU-native redesign draws a whole batch of B samples at once as pure
index tensors from `jax.random`, so thousands of minimal problems solve and
score as one fused computation.

Sampler ids follow the reference front ends (progressivex_python.cpp:215-245):
  0 = uniform, 1 = PROSAC, 2 = Progressive NAPSAC, 3 = NAPSAC.

Batched semantics:
  * uniform  — Gumbel top-m over the valid mask = uniform sample w/o
    replacement per hypothesis.
  * PROSAC   — hypothesis b draws from the top-n(b) quality-ranked prefix,
    n(b) ramping m+1 -> n_valid across the batch (the batched analog of the
    PROSAC growth schedule; inputs must be quality-sorted like the
    reference warns at progressivex_python.cpp:217-220).
  * NAPSAC   — a random center point plus m-1 of its kNN neighbors.
  * P-NAPSAC — local-to-global anneal across the batch: early hypotheses
    sample NAPSAC-style from small neighborhoods, late hypotheses blend to
    global uniform (mirrors the 0.5-blend-length construction at
    progressivex_python.cpp:227-235).

All samplers return (idx [B, m] int32, ok [B] bool).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_NEG = -1e30


def _gumbel(key, shape, dtype=jnp.float32):
    u = jax.random.uniform(key, shape, dtype=dtype, minval=1e-20, maxval=1.0)
    return -jnp.log(-jnp.log(u))


def _topk_sample(key, logw, m: int):
    """Sample m distinct indices per row of logw [B, N] via Gumbel top-k."""
    g = _gumbel(key, logw.shape) + logw
    vals, idx = lax.top_k(g, m)
    ok = vals[:, -1] > _NEG / 2
    return idx.astype(jnp.int32), ok


def uniform_sample(key, n_hyp: int, m: int, valid_mask):
    logw = jnp.where(valid_mask, 0.0, _NEG)[None, :].repeat(n_hyp, axis=0)
    return _topk_sample(key, logw, m)


def prosac_sample(key, n_hyp: int, m: int, valid_mask, n_valid):
    """Prefix-growth sampling; assumes rows are quality-sorted descending."""
    n = valid_mask.shape[0]
    rank = jnp.arange(n)
    b = jnp.arange(n_hyp, dtype=jnp.float32)[:, None]
    frac = (b + 1.0) / n_hyp
    prefix = jnp.minimum(
        m + jnp.ceil(frac * (n_valid.astype(jnp.float32) - m)), n_valid
    )
    logw = jnp.where((rank[None, :] < prefix) & valid_mask[None, :], 0.0, _NEG)
    return _topk_sample(key, logw, m)


def napsac_sample(key, n_hyp: int, m: int, valid_mask, knn_idx, knn_mask):
    """Center + (m-1) of its kNN neighbors; falls back to uniform when the
    neighborhood is too small."""
    k_center, k_nbr, k_fallback = jax.random.split(key, 3)
    # Centers: one Gumbel top-1 draw per hypothesis.
    c_idx, _ = _topk_sample(
        k_center, jnp.where(valid_mask, 0.0, _NEG)[None, :].repeat(n_hyp, axis=0), 1
    )
    centers = c_idx[:, 0]  # [B]
    nbr_ids = knn_idx[centers]  # [B, K]
    nbr_ok = knn_mask[centers]  # [B, K]
    g = _gumbel(k_nbr, nbr_ok.shape) + jnp.where(nbr_ok, 0.0, _NEG)
    vals, pick = lax.top_k(g, m - 1)
    picked = jnp.take_along_axis(nbr_ids, pick, axis=1)
    idx = jnp.concatenate([centers[:, None], picked], axis=1).astype(jnp.int32)
    ok = vals[:, -1] > _NEG / 2
    # Fallback: uniform samples wherever the neighborhood was too small.
    u_idx, u_ok = uniform_sample(k_fallback, n_hyp, m, valid_mask)
    idx = jnp.where(ok[:, None], idx, u_idx)
    return idx, ok | u_ok


def progressive_napsac_sample(key, n_hyp: int, m: int, valid_mask, knn_idx, knn_mask):
    """Local-to-global anneal: NAPSAC for the first half of the batch,
    uniform for the second half (the batched counterpart of P-NAPSAC's
    per-iteration neighborhood growth)."""
    k_local, k_global = jax.random.split(key)
    l_idx, l_ok = napsac_sample(k_local, n_hyp, m, valid_mask, knn_idx, knn_mask)
    g_idx, g_ok = uniform_sample(k_global, n_hyp, m, valid_mask)
    use_local = jnp.arange(n_hyp) < n_hyp // 2
    idx = jnp.where(use_local[:, None], l_idx, g_idx)
    return idx, jnp.where(use_local, l_ok, g_ok)


def sample_minimal(
    key,
    sampler_id: int,
    n_hyp: int,
    m: int,
    valid_mask,
    n_valid,
    knn_idx,
    knn_mask,
):
    """Dispatch on the (static) sampler id. Returns (idx [B, m], ok [B])."""
    if sampler_id == 0:
        return uniform_sample(key, n_hyp, m, valid_mask)
    if sampler_id == 1:
        return prosac_sample(key, n_hyp, m, valid_mask, n_valid)
    if sampler_id == 2:
        return progressive_napsac_sample(
            key, n_hyp, m, valid_mask, knn_idx, knn_mask
        )
    if sampler_id == 3:
        return napsac_sample(key, n_hyp, m, valid_mask, knn_idx, knn_mask)
    raise ValueError(f"Unknown sampler id {sampler_id}")
