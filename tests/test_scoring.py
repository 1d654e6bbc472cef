"""Scoring kernel parity vs a NumPy oracle of the reference formulas
(`scoring_function_with_compound_model.h:61-125`, `progressive_x.h:583-585`)."""

import numpy as np
import jax.numpy as jnp

from progressivex_tpu.ops.scoring import (
    compound_penalized_scores,
    tanimoto_similarity,
    truncated_preference,
)


def oracle_score(r2, compound, trunc, exponent, has_compound, mask):
    pref = np.maximum(0.0, 1.0 - r2 / trunc) * mask
    raw = pref.sum(-1)
    if not has_compound:
        return raw, pref
    shared = np.minimum(pref, compound[None, :]).sum(-1)
    return raw - shared**exponent, pref


def test_scores_match_oracle():
    r = np.random.default_rng(0)
    B, N = 16, 100
    trunc = 4.0
    r2 = r.uniform(0, 12, size=(B, N))
    compound = r.uniform(0, 1, size=(N,))
    mask = r.uniform(size=N) > 0.1
    for exponent in (1.0, 2.0, 3.0):
        for has in (False, True):
            want, want_pref = oracle_score(r2, compound, trunc, exponent, has, mask)
            got, inl, pref = compound_penalized_scores(
                jnp.array(r2), jnp.array(compound), jnp.array(mask),
                trunc, exponent, has,
            )
            np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(
                np.asarray(pref), want_pref, rtol=1e-4, atol=1e-6
            )
    # Inlier counts use the RAW threshold tau^2 = trunc / 2.25, matching
    # the reference's validation against GC-RANSAC's tau-inliers
    # (progressive_x.h:571-575).
    want_inl = ((r2 < trunc / 2.25) & mask[None, :]).sum(-1)
    np.testing.assert_array_equal(np.asarray(inl), want_inl)


def test_truncated_preference_matches_reference_form():
    # progx_model.h:70-87: pref = max(0, 1 - r^2 / tau_t^2)
    r2 = jnp.array([0.0, 1.0, 4.0, 5.0, 100.0])
    pref = truncated_preference(r2, 4.0)
    np.testing.assert_allclose(np.asarray(pref), [1.0, 0.75, 0.0, 0.0, 0.0])


def test_tanimoto():
    a = np.array([1.0, 0.5, 0.0, 0.2])
    b = np.array([0.9, 0.0, 0.3, 0.2])
    dot = (a * b).sum()
    want = dot / ((a * a).sum() + (b * b).sum() - dot)
    got = float(tanimoto_similarity(jnp.array(a), jnp.array(b)))
    assert abs(got - want) < 1e-6
    # Empty compound vector -> similarity 0 (never rejects the first model).
    assert float(tanimoto_similarity(jnp.array(a), jnp.zeros(4))) == 0.0
    assert float(tanimoto_similarity(jnp.zeros(4), jnp.zeros(4))) == 0.0
