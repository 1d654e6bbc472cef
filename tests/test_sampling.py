"""Batched sampler unit tests (ops/sampling).

The samplers are pure index generators; these pin their contracts — index
validity, the suffix-padding invariant, determinism — and the slot-first
P-NAPSAC gather's bit-equivalence to the full-row-gather formulation it
replaced for speed (round 5: the row gather was the F protocol program's
largest single op; the replacement must keep samples IDENTICAL, which is
what exempted it from quality revalidation).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from progressivex_tpu.ops import sampling


def _knn_tables(n=200, k=48, seed=0):
    r = np.random.default_rng(seed)
    return (jnp.asarray(r.integers(0, n, (n, k)), jnp.int32),
            jnp.asarray(r.random((n, k)) < 0.8))


@pytest.mark.parametrize("sampler_id", [0, 1, 2, 3])
def test_samplers_valid_indices_and_determinism(sampler_id):
    knn_idx, knn_mask = _knn_tables()
    key = jax.random.PRNGKey(3)
    n_valid = jnp.int32(180)
    idx, ok = sampling.sample_minimal(key, sampler_id, 256, 7, None,
                                      n_valid, knn_idx, knn_mask)
    assert idx.shape == (256, 7) and ok.shape == (256,)
    assert bool(ok.any()), "no valid samples at 180 valid points"
    # ok rows must index the valid prefix only, with distinct members.
    rows = np.asarray(idx)[np.asarray(ok)]
    assert rows.min() >= 0
    # NAPSAC companions come from kNN tables whose ids are < n (=200);
    # centers and uniform draws stay < n_valid.
    assert rows.max() < 200
    for row in rows[:32]:
        assert len(set(row.tolist())) == len(row) or sampler_id in (2, 3)
    idx2, ok2 = sampling.sample_minimal(key, sampler_id, 256, 7, None,
                                        n_valid, knn_idx, knn_mask)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx2))


def test_progressive_napsac_slot_first_matches_row_gather():
    """The flattened 1-D pair gather must reproduce the old full-row
    `knn_idx[centers]` + take_along_axis formulation bit for bit."""
    knn_idx, knn_mask = _knn_tables(seed=1)
    key = jax.random.PRNGKey(7)
    n_hyp, m = 256, 7
    n_valid = jnp.int32(180)
    idx, ok = sampling.progressive_napsac_sample(
        key, n_hyp, m, n_valid, knn_idx, knn_mask)

    # Reference formulation (the pre-round-5 code path).
    neg = -1e30
    k_center, k_nbr, k_global = jax.random.split(key, 3)
    k_max = knn_idx.shape[1]
    centers = jax.random.randint(
        k_center, (n_hyp,), 0, jnp.maximum(n_valid, 1)).astype(jnp.int32)
    nbr_ids = knn_idx[centers]
    nbr_ok = knn_mask[centers]
    n_local = (n_hyp * 7) // 8
    b = jnp.arange(n_hyp, dtype=jnp.float32)
    frac = jnp.minimum(b / jnp.maximum(n_local - 1, 1), 1.0)
    k_b = jnp.ceil((m - 1) + frac * (k_max - (m - 1)))
    in_window = jnp.arange(k_max)[None, :] < k_b[:, None]
    g = jax.random.gumbel(k_nbr, nbr_ok.shape) + jnp.where(
        nbr_ok & in_window, 0.0, neg)
    vals, pick = lax.top_k(g, m - 1)
    picked = jnp.take_along_axis(nbr_ids, pick, axis=1)
    l_idx = jnp.concatenate([centers[:, None], picked], 1).astype(jnp.int32)
    l_ok = vals[:, -1] > neg / 2
    g_idx, g_ok = sampling.uniform_sample(k_global, n_hyp, m, n_valid)
    take_local = (jnp.arange(n_hyp) < n_local) & l_ok
    ref_idx = jnp.where(take_local[:, None], l_idx, g_idx)
    ref_ok = jnp.where(take_local, l_ok, g_ok)

    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref_idx))
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ref_ok))
