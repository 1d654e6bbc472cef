"""Homography family: data row = [x1, y1, x2, y2], descriptor = flattened
3x3 H (row-major) mapping image-1 points to image-2 points.

Reference parity: `gcransac::utils::DefaultHomographyEstimator`
(consumed at `/root/reference/src/pyprogressivex/src/progressivex_python.cpp:252`,
sampleSize = 4): minimal = 4-point DLT, non-minimal = normalized weighted DLT
on the inliers, residual = transfer error in the destination image.
Output layout (row-major 3x3) matches
`/root/reference/src/pyprogressivex/src/progressivex_python.cpp:292-300`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from progressivex_tpu.models.base import ModelFamily, register_family
from progressivex_tpu.ops.linalg import (
    hartley_normalize,
    nullspace_exact,
    nullspace_exact_lanes,
    smallest_eigvec_psd,
)

_EPS = 1e-12


def _dlt_rows(p1, p2, w):
    """Two DLT rows per correspondence, scaled by sqrt weights.

    p1, p2: [N, 2]; w: [N]. Returns [2N, 9].
    """
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r0 = jnp.stack([-x1, -y1, -o, z, z, z, x2 * x1, x2 * y1, x2], axis=-1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    sw = jnp.sqrt(jnp.maximum(w, 0.0))[:, None]
    return jnp.concatenate([r0 * sw, r1 * sw], axis=0)


def _solve_h(p1, p2, weights, exact_nullspace: bool = False):
    """Normalized (weighted) DLT: returns (H [3,3], valid).

    exact_nullspace=True extracts the 1-D null space of A by unrolled
    Gauss-Jordan elimination (ops/linalg.nullspace_exact — used for the
    minimal 4-point case, where forming A^T A would square the condition
    number); the non-minimal refit uses the 9x9 normal matrix, whose cost
    is independent of N.
    """
    n1, T1 = hartley_normalize(p1, weights)
    n2, T2 = hartley_normalize(p2, weights)
    A = _dlt_rows(n1, n2, weights)
    ns_valid = True
    if exact_nullspace:
        # Minimal 4-point case: the 8x9 system has an exact 1-D null space;
        # unrolled Gauss-Jordan extraction is orders of magnitude faster on
        # TPU than batched SVD and equally accurate (validated by the
        # residual check inside nullspace_exact).
        basis, ns_valid = nullspace_exact(A, 1)
        h = basis[0]
    else:
        M = A.T @ A  # 9x9 normal matrix; smallest eigenvector = LSQ solution
        h = smallest_eigvec_psd(M)
    Hn = h.reshape(3, 3)
    # Denormalize: x2 = T2^-1 Hn T1 x1.
    T2inv = jnp.linalg.inv(T2)
    H = T2inv @ Hn @ T1
    scale = H[2, 2]
    big = jnp.max(jnp.abs(H))
    # Normalize by H[2,2] when well-conditioned, else by the largest entry.
    denom = jnp.where(jnp.abs(scale) > 1e-8 * big, scale, jnp.where(big > _EPS, big, 1.0))
    H = H / denom
    valid = ns_valid & jnp.isfinite(H).all() & (jnp.abs(jnp.linalg.det(H)) > 1e-10)
    return H, valid


_TRIPLES = ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3))


def _sample_orientation_ok(p1, p2):
    """GC-RANSAC HomographyEstimator sample-validity parity (the same
    test as OpenCV's checkSubset): a planar homography maps every point
    triple's orientation consistently — either all four triples keep
    their winding between the images or all four flip (viewing the plane
    from the other side). A 4-point sample mixing two planes (or pairing
    points across structures) violates this and cannot yield a physically
    meaningful H, so it is rejected before (or regardless of) the solve.

    p1, p2: [..., 4, 2] sample points in each image (leading batch dims
    broadcast). Returns [...] bool.
    """

    def cross_sign(p, i, j, k):
        u = p[..., j, :] - p[..., i, :]
        v = p[..., k, :] - p[..., i, :]
        return u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0]

    q = jnp.stack(
        [cross_sign(p1, *t) * cross_sign(p2, *t) for t in _TRIPLES],
        axis=-1,
    )  # [..., 4] triple-orientation products
    return jnp.all(q > 0.0, axis=-1) | jnp.all(q < 0.0, axis=-1)


def _minimal(samples):
    """4-point DLT. samples: [4, 4] -> ([1, 9], [1] bool)."""
    w = jnp.ones((4,), samples.dtype)
    H, valid = _solve_h(samples[:, :2], samples[:, 2:4], w, exact_nullspace=True)
    valid = valid & _sample_orientation_ok(samples[:, :2], samples[:, 2:4])
    return H.reshape(1, 9), valid[None]


def _minimal_batched(samples):
    """Batched 4-point DLT in lanes-major layout. samples: [B, 4, 4] ->
    ([B, 1, 9], [B, 1] bool).

    Hardware note: vmapping `_minimal` leaves the unrolled Gauss-Jordan
    operating on [B, 8, 9] tensors — the length-9 trailing axis sits on
    the 128 vector lanes at <8% utilization, and the minimal solve was the
    single hottest block of the whole proposal (~68 ms for 24k solves on a
    v5e). Here the 8x9 systems are stacked [8, 9, B] with the BATCH on
    lanes (ops/linalg.nullspace_exact_lanes) and the Hartley
    (de)normalization is written as closed-form scalar arithmetic on [B]
    arrays, so every op runs full-width.
    """
    dtype = samples.dtype
    p1 = samples[:, :, :2]  # [B, 4, 2]
    p2 = samples[:, :, 2:4]
    sqrt2 = jnp.sqrt(jnp.asarray(2.0, dtype))

    def norm_stats(p):
        c = jnp.mean(p, axis=1)  # [B, 2]
        d = jnp.mean(
            jnp.linalg.norm(p - c[:, None, :], axis=-1), axis=1
        )  # [B]
        s = sqrt2 / jnp.maximum(d, _EPS)
        return c, s, (p - c[:, None, :]) * s[:, None, None]

    c1, s1, n1 = norm_stats(p1)
    c2, s2, n2 = norm_stats(p2)

    rows = []
    one = jnp.ones_like(n1[:, 0, 0])
    zero = jnp.zeros_like(one)
    for j in range(4):
        x1, y1 = n1[:, j, 0], n1[:, j, 1]
        x2, y2 = n2[:, j, 0], n2[:, j, 1]
        rows.append(jnp.stack(
            [-x1, -y1, -one, zero, zero, zero, x2 * x1, x2 * y1, x2]
        ))  # [9, B]
        rows.append(jnp.stack(
            [zero, zero, zero, -x1, -y1, -one, y2 * x1, y2 * y1, y2]
        ))
    A = jnp.stack(rows)  # [8, 9, B]
    basis, ns_valid = nullspace_exact_lanes(A, 1)
    h = basis[0]  # [9, B] normalized null vector of the normalized system

    # Denormalize H = T2^-1 Hn T1 in closed form (T similarity transforms):
    #   Hn T1 scales cols 0,1 by s1 and folds the centroid into col 2;
    #   T2^-1 un-scales rows 0,1 by s2 and adds c2 times row 2.
    Hn = h.reshape(3, 3, -1)
    m0 = s1[None, :] * Hn[:, 0, :]  # [3, B] column 0
    m1 = s1[None, :] * Hn[:, 1, :]
    m2 = (
        Hn[:, 2, :]
        - (s1 * c1[:, 0])[None, :] * Hn[:, 0, :]
        - (s1 * c1[:, 1])[None, :] * Hn[:, 1, :]
    )
    M = jnp.stack([m0, m1, m2], axis=1)  # [3(row), 3(col), B]
    H = jnp.stack(
        [
            M[0] / s2[None, :] + c2[:, 0][None, :] * M[2],
            M[1] / s2[None, :] + c2[:, 1][None, :] * M[2],
            M[2],
        ],
        axis=0,
    )  # [3, 3, B]

    scale = H[2, 2]
    big = jnp.max(jnp.abs(H), axis=(0, 1))
    denom = jnp.where(
        jnp.abs(scale) > 1e-8 * big, scale, jnp.where(big > _EPS, big, 1.0)
    )
    H = H / denom[None, None, :]
    det = (
        H[0, 0] * (H[1, 1] * H[2, 2] - H[1, 2] * H[2, 1])
        - H[0, 1] * (H[1, 0] * H[2, 2] - H[1, 2] * H[2, 0])
        + H[0, 2] * (H[1, 0] * H[2, 1] - H[1, 1] * H[2, 0])
    )
    valid = (
        ns_valid
        & jnp.isfinite(H).all(axis=(0, 1))
        & (jnp.abs(det) > 1e-10)
        & _sample_orientation_ok(p1, p2)
    )
    descs = jnp.moveaxis(H.reshape(9, -1), -1, 0)[:, None, :]  # [B, 1, 9]
    return descs, valid[:, None]


def _scene_conditioners(data):
    """Scene-level (weight-INDEPENDENT) Hartley-style conditioning stats.

    Depending only on `data`, the conditioned row tensors derived from
    them are loop-invariant, so each weighted refit is a pair of tiny
    normal-matrix contractions instead of materializing a [K, 2N, 9]
    weighted row tensor per refit call (which was the single largest
    PEARL line item). Padding rows are included in the stats — harmless,
    conditioning only needs coordinates at O(1)."""
    sqrt2 = jnp.sqrt(jnp.asarray(2.0, data.dtype))

    def stats(p):
        c = jnp.mean(p, axis=0)
        d = jnp.mean(jnp.linalg.norm(p - c, axis=-1))
        s = sqrt2 / jnp.maximum(d, _EPS)
        return c, s

    c1, s1 = stats(data[:, :2])
    c2, s2 = stats(data[:, 2:4])
    n1 = (data[:, :2] - c1) * s1
    n2 = (data[:, 2:4] - c2) * s2
    return n1, n2, (c1, s1), (c2, s2)


def _nonminimal(data, weights):
    """Weighted DLT over all points via loop-invariant row tensors.
    data: [N, 4], weights: [N] -> ([9], valid)."""
    dtype = data.dtype
    n1, n2, (c1, s1), (c2, s2) = _scene_conditioners(data)
    x1, y1 = n1[:, 0], n1[:, 1]
    x2, y2 = n2[:, 0], n2[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r0 = jnp.stack([-x1, -y1, -o, z, z, z, x2 * x1, x2 * y1, x2], axis=-1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    # Contract the weighted normal matrix directly from the [N, 9] row
    # tensors (data-only, so they stay loop-invariant): materializing the
    # [N, 9, 9] per-point outer products instead was measured to cost
    # ~1.2 ms per PEARL iteration in pure HBM traffic — XLA does not hoist
    # multi-MB loop-invariant temporaries out of while loops.
    w = jnp.maximum(weights, 0.0)
    # float32 (3-pass) precision: the conditioned rows are O(1), so the
    # default bf16 operand truncation would leave ~0.3% error in the
    # normal matrix (too much for the eigenvector), while full HIGHEST
    # costs 2x more passes than needed.
    M = jnp.einsum(
        "n,ni,nj->ij", w, r0, r0, precision=jax.lax.Precision.HIGH
    ) + jnp.einsum(
        "n,ni,nj->ij", w, r1, r1, precision=jax.lax.Precision.HIGH
    )
    h = smallest_eigvec_psd(M)
    Hn = h.reshape(3, 3)
    # Denormalize H = T2^-1 Hn T1 with similarity conditioners.
    zero = jnp.zeros((), dtype)
    one = jnp.ones((), dtype)
    T1 = jnp.stack([
        jnp.stack([s1, zero, -s1 * c1[0]]),
        jnp.stack([zero, s1, -s1 * c1[1]]),
        jnp.stack([zero, zero, one]),
    ])
    T2inv = jnp.stack([
        jnp.stack([one / s2, zero, c2[0]]),
        jnp.stack([zero, one / s2, c2[1]]),
        jnp.stack([zero, zero, one]),
    ])
    H = T2inv @ Hn @ T1
    scale = H[2, 2]
    big = jnp.max(jnp.abs(H))
    denom = jnp.where(
        jnp.abs(scale) > 1e-8 * big, scale, jnp.where(big > _EPS, big, 1.0)
    )
    H = H / denom
    valid = (
        jnp.isfinite(H).all()
        & (jnp.abs(jnp.linalg.det(H)) > 1e-10)
        & (jnp.sum(weights > 0) >= 4)
    )
    return H.reshape(9), valid


def _squared_residual(data, desc):
    """Transfer error squared in the destination image. data: [N, 4] -> [N]."""
    H = desc.reshape(3, 3)
    x1, y1 = data[:, 0], data[:, 1]
    x2, y2 = data[:, 2], data[:, 3]
    px = H[0, 0] * x1 + H[0, 1] * y1 + H[0, 2]
    py = H[1, 0] * x1 + H[1, 1] * y1 + H[1, 2]
    pz = H[2, 0] * x1 + H[2, 1] * y1 + H[2, 2]
    pz_safe = jnp.where(jnp.abs(pz) > 1e-9, pz, 1e-9)
    dx = px / pz_safe - x2
    dy = py / pz_safe - y2
    r2 = dx * dx + dy * dy
    # Points near the plane at infinity of H get an effectively infinite
    # residual, mirroring the unbounded transfer error.
    return jnp.where(jnp.abs(pz) > 1e-9, r2, jnp.full_like(r2, 1e18))


HOMOGRAPHY = register_family(
    ModelFamily(
        name="homography",
        data_dim=4,
        sample_size=4,
        nonminimal_min=4,
        max_solutions=1,
        desc_dim=9,
        desc_shape=(3, 3),
        minimal_solver=_minimal,
        minimal_solver_batched=_minimal_batched,
        nonminimal_solver=_nonminimal,
        squared_residual=_squared_residual,
    )
)
