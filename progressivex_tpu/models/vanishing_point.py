"""Vanishing-point family: data row = segment [xs, ys, xe, ye], descriptor =
unit homogeneous 3-vector.

Reference parity:
  * minimal solver (two segments, chained cross products):
    `/root/reference/src/pyprogressivex/include/solver_vanishing_point_two_lines.h:147-184`
  * non-minimal weighted homogeneous LSQ (row = (ys*mz-my, mx-xs*mz,
    xs*my-ys*mx) * w, eigenvector of A^T A with smallest eigenvalue):
    same file, lines 185-233
  * residual = distance from the segment START point to the line joining
    the VP and the segment MIDPOINT:
    `/root/reference/src/pyprogressivex/include/vanishing_point_estimator.h:166-189`
"""

from __future__ import annotations

import jax.numpy as jnp

from progressivex_tpu.models.base import ModelFamily, register_family
from progressivex_tpu.ops.linalg import normalize_vec, smallest_eigvec_psd

_EPS = 1e-12


def _seg_line(xs, ys, xe, ye):
    """Homogeneous line through segment endpoints (cross product)."""
    a = ys - ye
    b = xe - xs
    c = xs * ye - ys * xe
    return jnp.stack([a, b, c], axis=-1)


def _minimal(samples):
    """Intersection of two segment-supporting lines. samples: [2, 4]."""
    l0 = _seg_line(samples[0, 0], samples[0, 1], samples[0, 2], samples[0, 3])
    l1 = _seg_line(samples[1, 0], samples[1, 1], samples[1, 2], samples[1, 3])
    v = jnp.cross(l0, l1)
    nrm = jnp.linalg.norm(v)
    valid = nrm > 1e-9
    v = v / jnp.maximum(nrm, _EPS)
    return v[None, :], valid[None]


def _constraint_rows(data):
    """Rows of the homogeneous system: the VP lies on each midpoint line."""
    x0, y0, x1, y1 = data[:, 0], data[:, 1], data[:, 2], data[:, 3]
    mx = (x0 + x1) / 2.0
    my = (y0 + y1) / 2.0
    # (y0 * mz - my, mx - x0 * mz, x0 * my - y0 * mx), mz = 1
    return jnp.stack([y0 - my, mx - x0, x0 * my - y0 * mx], axis=-1)


def _nonminimal(data, weights):
    """Weighted homogeneous LSQ over all segments. data: [N, 4]."""
    A = _constraint_rows(data) * weights[:, None]
    M = A.T @ A  # 3x3
    v = smallest_eigvec_psd(M)
    v = normalize_vec(v)
    valid = jnp.isfinite(v).all() & (jnp.sum(weights > 0) >= 2)
    return v, valid


def _squared_residual(data, desc):
    """Midpoint-line-to-start-point distance squared. data: [N, 4]."""
    xs, ys = data[:, 0], data[:, 1]
    xe, ye = data[:, 2], data[:, 3]
    mx = (xs + xe) / 2.0
    my = (ys + ye) / 2.0
    # Line joining the VP (desc) and the midpoint (mx, my, 1): cross product.
    lx = my * desc[2] - desc[1]
    ly = -(mx * desc[2] - desc[0])
    lz = mx * desc[1] - my * desc[0]
    num = lx * xs + ly * ys + lz
    den = jnp.maximum(lx * lx + ly * ly, _EPS)
    return num * num / den


VANISHING_POINT = register_family(
    ModelFamily(
        name="vanishing_point",
        data_dim=4,
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
