"""Scoring kernel parity vs a NumPy oracle of the reference formulas
(`scoring_function_with_compound_model.h:61-125`, `progressive_x.h:583-585`)."""

import numpy as np
import jax.numpy as jnp

from progressivex_tpu.ops.scoring import (
    compound_penalized_scores,
    sigma_marginalized_preference,
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
            got, inl, dots, norms = compound_penalized_scores(
                jnp.array(r2), jnp.array(compound), jnp.array(mask),
                trunc, exponent, has,
            )
            np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
            # Tanimoto moments of every hypothesis (the [B, N] preference
            # matrix itself is deliberately not part of the interface —
            # all consumers are reductions; see the function docstring).
            np.testing.assert_allclose(
                np.asarray(dots), want_pref @ compound, rtol=1e-4, atol=1e-6)
            np.testing.assert_allclose(
                np.asarray(norms), (want_pref**2).sum(-1), rtol=1e-4,
                atol=1e-6)
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


def test_sigma_marginalized_preference():
    """The MAGSAC++-style soft preference equals the mean of truncated
    preferences over the sigma ladder, upper-bounded by the hard-tau
    preference, and concentrates on tight residuals."""
    r = np.random.default_rng(1)
    r2 = r.uniform(0, 10, size=(8, 50))
    trunc = 4.0
    m = 4
    got = np.asarray(sigma_marginalized_preference(jnp.array(r2), trunc, m))
    want = np.mean(
        [np.maximum(0.0, 1.0 - r2 / ((j / m) ** 2 * trunc))
         for j in range(1, m + 1)],
        axis=0,
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    hard = np.maximum(0.0, 1.0 - r2 / trunc)
    assert np.all(got <= hard + 1e-6)
    # A residual at r ~ 0 keeps full weight; a marginal one loses most.
    assert float(sigma_marginalized_preference(jnp.zeros(()), trunc, m)) == 1.0
    tight = float(sigma_marginalized_preference(jnp.array(0.01 * trunc), trunc, m))
    marginal = float(
        sigma_marginalized_preference(jnp.array(0.9 * trunc), trunc, m))
    assert tight > 5 * marginal


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
