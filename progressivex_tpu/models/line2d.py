"""2D line family: data row = [x, y], descriptor = (a, b, c) with a^2+b^2=1.

Reference parity: `gcransac::utils::Default2DLineEstimator` consumed at
`/root/reference/src/pyprogressivex/src/progressivex_python.cpp:489`;
minimal = line through two points, non-minimal = weighted total least
squares, residual = point-line distance.
"""

from __future__ import annotations

import jax.numpy as jnp

from progressivex_tpu.models.base import ModelFamily, register_family
from progressivex_tpu.ops.linalg import smallest_eigvec_2x2

_EPS = 1e-12


def _minimal(samples):
    """Line through two points. samples: [2, 2] -> ([1, 3], [1] bool)."""
    p0, p1 = samples[0], samples[1]
    d = p1 - p0
    nrm = jnp.linalg.norm(d)
    valid = nrm > 1e-9
    d = d / jnp.maximum(nrm, _EPS)
    n = jnp.stack([-d[1], d[0]])  # unit normal
    c = -jnp.dot(n, p0)
    desc = jnp.concatenate([n, c[None]])
    return desc[None, :], valid[None]


def _nonminimal(data, weights):
    """Weighted total-least-squares line fit. data: [N, 2], weights: [N]."""
    wsum = jnp.maximum(jnp.sum(weights), _EPS)
    mu = jnp.sum(weights[:, None] * data, axis=0) / wsum
    centered = data - mu
    M = (weights[:, None] * centered).T @ centered  # 2x2 scatter
    n = smallest_eigvec_2x2(M)  # unit normal of the best-fit line
    c = -jnp.dot(n, mu)
    desc = jnp.concatenate([n, c[None]])
    valid = jnp.isfinite(desc).all() & (jnp.sum(weights > 0) >= 2)
    return desc, valid


def _squared_residual(data, desc):
    """Squared point-line distance. data: [N, 2] -> [N]."""
    a, b, c = desc[0], desc[1], desc[2]
    num = a * data[:, 0] + b * data[:, 1] + c
    den = jnp.maximum(a * a + b * b, _EPS)
    return num * num / den


LINE2D = register_family(
    ModelFamily(
        name="line2d",
        data_dim=2,
        sample_size=2,
        nonminimal_min=2,
        max_solutions=1,
        desc_dim=3,
        desc_shape=(3,),
        minimal_solver=_minimal,
        nonminimal_solver=_nonminimal,
        squared_residual=_squared_residual,
    )
)
