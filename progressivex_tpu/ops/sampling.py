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
  * uniform  — m independent uniform draws per hypothesis; the rare
    duplicate collision (P ~ m^2/2N) just invalidates that hypothesis.
  * PROSAC   — hypothesis b draws from the top-n(b) quality-ranked prefix,
    n(b) ramping m+1 -> n_valid across the batch (the batched analog of the
    PROSAC growth schedule; inputs must be quality-sorted like the
    reference warns at progressivex_python.cpp:217-220).
  * NAPSAC   — a random center point plus m-1 of its kNN neighbors.
  * P-NAPSAC — local-to-global anneal across the batch: early hypotheses
    sample NAPSAC-style from small neighborhoods, late hypotheses blend to
    global uniform (mirrors the 0.5-blend-length construction at
    progressivex_python.cpp:227-235).

Hardware note: index generation is pure integer math sized [B, m] — NO
[B, N] tensors. An earlier Gumbel-top-k formulation materialized a [B, N]
logit matrix + top_k per proposal round and cost 46-90 ms per call on a
v5e at B=1000, N~2k (it was the single largest line item in the whole fit);
the randint formulation is ~3 ms. This relies on the engine-wide invariant
that padding rows are a SUFFIX: valid data rows are exactly 0..n_valid-1
(the API layer pads that way by construction), so a uniform valid index is
just randint(0, n_valid). Duplicate indices within a sample mark it
invalid (`ok=False`) rather than being resampled — data-independent shapes
beat a rejection loop, and the engine already treats invalid samples as
failed hypotheses.

All samplers return (idx [B, m] int32, ok [B] bool).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_NEG = -1e30


def _distinct(idx):
    """[B] bool: no duplicate indices within a row of idx [B, m]."""
    m = idx.shape[-1]
    dup = (idx[:, :, None] == idx[:, None, :]) & ~jnp.eye(m, dtype=bool)[None]
    return ~jnp.any(dup, axis=(1, 2))


def uniform_sample(key, n_hyp: int, m: int, n_valid):
    """m uniform draws from the valid prefix [0, n_valid) per hypothesis."""
    idx = jax.random.randint(key, (n_hyp, m), 0, jnp.maximum(n_valid, 1))
    return idx.astype(jnp.int32), _distinct(idx) & (n_valid >= m)


def prosac_sample(key, n_hyp: int, m: int, n_valid):
    """Prefix-growth sampling; assumes rows are quality-sorted descending."""
    b = jnp.arange(n_hyp, dtype=jnp.float32)[:, None]
    frac = (b + 1.0) / n_hyp
    nv = n_valid.astype(jnp.float32)
    prefix = jnp.minimum(m + jnp.ceil(frac * (nv - m)), nv)
    prefix = jnp.maximum(prefix, 1.0).astype(jnp.int32)  # [B, 1]
    u = jax.random.uniform(key, (n_hyp, m))
    idx = jnp.floor(u * prefix.astype(jnp.float32)).astype(jnp.int32)
    idx = jnp.minimum(idx, prefix - 1)
    return idx, _distinct(idx) & (n_valid >= m)


def napsac_sample(key, n_hyp: int, m: int, n_valid, knn_idx, knn_mask):
    """Center + (m-1) of its kNN neighbors; falls back to uniform when the
    neighborhood is too small.

    Slot-first gathering: the Gumbel top-k picks neighbor SLOTS from the
    [B, K] validity mask (a 1-byte gather), and only the m-1 chosen
    (center, slot) pairs are then gathered from the int32 kNN table —
    materializing the full [B, K] id table first cost ~16x the bytes and
    was a visible line item of the presampling pass at B ~ 10k."""
    k_center, k_nbr, k_fallback = jax.random.split(key, 3)
    centers = jax.random.randint(
        k_center, (n_hyp,), 0, jnp.maximum(n_valid, 1)
    ).astype(jnp.int32)
    nbr_ok = knn_mask[centers]  # [B, K] bool
    # Choose m-1 distinct neighbor slots: Gumbel top-k over the tiny K axis.
    g = jax.random.gumbel(k_nbr, nbr_ok.shape) + jnp.where(nbr_ok, 0.0, _NEG)
    vals, pick = lax.top_k(g, m - 1)
    picked = knn_idx[centers[:, None], pick]  # [B, m-1] pair gather
    idx = jnp.concatenate([centers[:, None], picked], axis=1).astype(jnp.int32)
    ok = vals[:, -1] > _NEG / 2
    # Fallback: uniform samples wherever the neighborhood was too small.
    u_idx, u_ok = uniform_sample(k_fallback, n_hyp, m, n_valid)
    idx = jnp.where(ok[:, None], idx, u_idx)
    return idx, ok | u_ok


def progressive_napsac_sample(key, n_hyp: int, m: int, n_valid, knn_idx, knn_mask):
    """Progressive NAPSAC: the neighborhood each hypothesis samples from
    GROWS across the batch — hypothesis b draws its m-1 companions from the
    center's nearest k(b) neighbors, with k(b) ramping from m-1 to the full
    sampler neighborhood, and the final ~12% of the batch samples globally.

    This is the batched counterpart of the reference's annealed grid-layer
    schedule (`progressivex_python.cpp:227-235`: {16, 8, 4, 2} grid layers
    blending to global). The strong local bias early in the schedule
    matters for multi-model two-view geometry: minimal samples spanning
    several rigid motions produce "bridge" models that score well globally
    but mix structures; mostly-local sampling makes clean single-structure
    hypotheses the common case, as in the reference.
    """
    k_center, k_nbr, k_global = jax.random.split(key, 3)
    k_max = knn_idx.shape[1]
    centers = jax.random.randint(
        k_center, (n_hyp,), 0, jnp.maximum(n_valid, 1)
    ).astype(jnp.int32)
    nbr_ok = knn_mask[centers]  # [B, K] 1-byte gather
    # Neighborhood size ramp: k(b) in [m-1, k_max] over the local phase.
    n_local = (n_hyp * 7) // 8
    b = jnp.arange(n_hyp, dtype=jnp.float32)
    frac = jnp.minimum(b / jnp.maximum(n_local - 1, 1), 1.0)
    k_b = jnp.ceil((m - 1) + frac * (k_max - (m - 1)))  # [B]
    in_window = jnp.arange(k_max)[None, :] < k_b[:, None]
    g = jax.random.gumbel(k_nbr, nbr_ok.shape) + jnp.where(
        nbr_ok & in_window, 0.0, _NEG
    )
    vals, pick = lax.top_k(g, m - 1)
    # Slot-first: only the m-1 CHOSEN (center, slot) pairs read the int32
    # kNN table. The full-row `knn_idx[centers]` gather this replaces was
    # the F protocol program's single largest op (fusion.31, 11.6% of
    # device time — 192 B of random-access table per hypothesis vs 24 B
    # here); the picked values are identical, so results are bit-equal.
    # Routed through ONE flattened 1-D gather: the [B, m-1] two-array
    # form `knn_idx[centers[:, None], pick]` reproducibly trips XLA TPU
    # memory-space assignment ("conflicting pending required assignment"
    # check-fail) at >= 64 scene lanes in THIS function's context.
    picked = knn_idx.reshape(-1)[centers[:, None] * k_max + pick]
    l_idx = jnp.concatenate([centers[:, None], picked], axis=1).astype(jnp.int32)
    l_ok = vals[:, -1] > _NEG / 2
    g_idx, g_ok = uniform_sample(k_global, n_hyp, m, n_valid)
    use_local = jnp.arange(n_hyp) < n_local
    # Local draws that lacked enough in-window neighbors fall back to the
    # global sample for that hypothesis.
    take_local = use_local & l_ok
    idx = jnp.where(take_local[:, None], l_idx, g_idx)
    return idx, jnp.where(take_local, l_ok, g_ok)


def sample_minimal(
    key,
    sampler_id: int,
    n_hyp: int,
    m: int,
    valid_mask,  # kept for interface compatibility; padding is a suffix
    n_valid,
    knn_idx,
    knn_mask,
):
    """Dispatch on the (static) sampler id. Returns (idx [B, m], ok [B])."""
    del valid_mask  # suffix-padding invariant: valid rows are 0..n_valid-1
    if sampler_id == 0:
        return uniform_sample(key, n_hyp, m, n_valid)
    if sampler_id == 1:
        return prosac_sample(key, n_hyp, m, n_valid)
    if sampler_id == 2:
        return progressive_napsac_sample(
            key, n_hyp, m, n_valid, knn_idx, knn_mask
        )
    if sampler_id == 3:
        return napsac_sample(key, n_hyp, m, n_valid, knn_idx, knn_mask)
    raise ValueError(f"Unknown sampler id {sampler_id}")
