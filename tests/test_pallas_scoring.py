"""Parity of the fused Pallas scoring kernel vs the XLA reference path.

Runs in Pallas interpreter mode on the CPU test backend (the kernel
enables `interpret` off-TPU); on TPU the same code path compiles to a
Mosaic kernel. Parity is asserted against
ops/scoring.compound_penalized_scores over the family's vmapped residual —
the definition the kernel fuses.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from progressivex_tpu.models import get_family
from progressivex_tpu.ops import pallas_scoring
from progressivex_tpu.ops.scoring import compound_penalized_scores


def _case(family_name, b=96, n=300, seed=0):
    r = np.random.default_rng(seed)
    fam = get_family(family_name)
    data = r.uniform(-50, 50, (n, 4)).astype(np.float32)
    # Descriptors from real minimal solves so the residual fields are
    # geometrically plausible (random 3x3s make every residual huge).
    idx = r.integers(0, n, (b, fam.sample_size))
    samples = jnp.array(data)[jnp.array(idx)]
    if fam.minimal_solver_batched is not None:
        descs, valid = fam.minimal_solver_batched(samples)
    else:
        descs, valid = jax.vmap(fam.minimal_solver)(samples)
    descs = np.asarray(descs.reshape(-1, fam.desc_dim))
    descs = descs[np.isfinite(descs).all(axis=1)][:b]
    compound = r.uniform(0, 1, n).astype(np.float32)
    pmask = r.uniform(size=n) > 0.15
    return fam, jnp.array(data), jnp.array(descs), jnp.array(compound), \
        jnp.array(pmask)


@pytest.mark.parametrize("family_name", ["fundamental", "homography"])
@pytest.mark.parametrize("magsac_levels", [0, 4])
def test_fused_scores_match_xla(family_name, magsac_levels):
    fam, data, descs, compound, pmask = _case(family_name)
    trunc_sq, exponent = 25.0, 2.0
    for has in (False, True):
        r2 = jax.vmap(fam.squared_residual, in_axes=(None, 0))(data, descs)
        want = compound_penalized_scores(
            r2, compound, pmask, trunc_sq, exponent, has,
            magsac_levels=magsac_levels)
        got = pallas_scoring.fused_scores(
            family_name, data, descs, compound, pmask, trunc_sq, exponent,
            has, magsac_levels=magsac_levels)
        for g, w, name, tol in zip(
                got, want, ("scores", "inliers", "dots", "norms"),
                (1e-3, 0, 1e-3, 1e-3)):
            g, w = np.asarray(g), np.asarray(w)
            if name == "inliers":
                np.testing.assert_array_equal(g, w, err_msg=name)
            else:
                np.testing.assert_allclose(
                    g, w, rtol=tol, atol=1e-2,
                    err_msg=f"{family_name}/{name} (magsac={magsac_levels},"
                            f" has_compound={has})")


def test_fused_scores_padding_independence():
    """Masked-out padding rows must not influence any reduction."""
    fam, data, descs, compound, pmask = _case("homography", n=256)
    base = pallas_scoring.fused_scores(
        "homography", data, descs, compound, pmask, 25.0, 2.0, True)
    # Corrupt every masked row's data wildly.
    bad = jnp.where(jnp.asarray(pmask)[:, None], data, 1e6)
    got = pallas_scoring.fused_scores(
        "homography", bad, descs, compound, pmask, 25.0, 2.0, True)
    for g, b in zip(got, base):
        np.testing.assert_allclose(np.asarray(g), np.asarray(b), rtol=1e-5)
