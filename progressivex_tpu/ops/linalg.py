"""Batched closed-form linear algebra used by the minimal/non-minimal solvers.

Everything here is shape-static, vmap-friendly and differentiable-free
(pure forward math), designed so XLA can fuse it and batch it onto the
TPU's VPU/MXU.  All functions accept single problems; the engine vmaps.

Reference parity notes: the upstream Progressive-X solvers rely on Eigen
(SelfAdjointEigenSolver / cross products), e.g.
`/root/reference/src/pyprogressivex/include/solver_vanishing_point_two_lines.h:147-233`.
Here the same decompositions are expressed as batched XLA ops.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12
_BIG = 1e18


def cross3(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cross product of 3-vectors (last axis)."""
    return jnp.cross(a, b)


def normalize_vec(v: jax.Array, axis: int = -1) -> jax.Array:
    n = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(n, _EPS)


def hartley_normalize(pts: jax.Array, weights: jax.Array):
    """Weighted Hartley normalization of 2D points.

    Args:
      pts: [N, 2] points.
      weights: [N] non-negative weights; zero-weight points are ignored.

    Returns:
      (pts_norm [N, 2], T [3, 3]) with ``p_norm_h = T @ p_h``. The weighted
      centroid maps to the origin and the weighted mean distance to sqrt(2).
    """
    wsum = jnp.maximum(jnp.sum(weights), _EPS)
    mean = jnp.sum(weights[:, None] * pts, axis=0) / wsum
    centered = pts - mean
    dist = jnp.linalg.norm(centered, axis=-1)
    mean_dist = jnp.sum(weights * dist) / wsum
    scale = jnp.sqrt(2.0) / jnp.maximum(mean_dist, _EPS)
    T = jnp.array(
        [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype=pts.dtype
    )
    T = T.at[0, 0].set(scale)
    T = T.at[1, 1].set(scale)
    T = T.at[0, 2].set(-scale * mean[0])
    T = T.at[1, 2].set(-scale * mean[1])
    return centered * scale, T


def smallest_eigvec_sym(M: jax.Array) -> jax.Array:
    """Eigenvector for the smallest eigenvalue of a symmetric matrix.

    jnp.linalg.eigh returns eigenvalues in ascending order, so column 0 is
    the null-space direction of A^T A systems.
    """
    _, vecs = jnp.linalg.eigh(M)
    return vecs[..., 0]


def two_smallest_eigvecs_sym(M: jax.Array):
    """Two eigenvectors with the smallest eigenvalues of a symmetric matrix."""
    _, vecs = jnp.linalg.eigh(M)
    return vecs[..., 0], vecs[..., 1]


def smallest_eigvec_2x2(M: jax.Array) -> jax.Array:
    """Closed-form smallest eigenvector of a symmetric 2x2 matrix.

    Cheaper than eigh for the 2D line fit; fully fused by XLA.
    """
    a, b, c = M[0, 0], M[0, 1], M[1, 1]
    # Smallest eigenvalue of [[a, b], [b, c]].
    tr = a + c
    det_gap = jnp.sqrt(jnp.maximum((a - c) ** 2 + 4.0 * b * b, 0.0))
    lam = 0.5 * (tr - det_gap)
    # (M - lam I) v = 0 -> v is orthogonal to either row; pick the bigger row.
    r0 = jnp.stack([a - lam, b])
    r1 = jnp.stack([b, c - lam])
    use0 = jnp.sum(r0 * r0) > jnp.sum(r1 * r1)
    row = jnp.where(use0, r0, r1)
    v = jnp.stack([-row[1], row[0]])
    nrm = jnp.linalg.norm(v)
    # Degenerate (isotropic) case: any direction works; pick x-axis.
    v = jnp.where(nrm > _EPS, v / jnp.maximum(nrm, _EPS), jnp.array([1.0, 0.0], v.dtype))
    return v


def _cbrt_signed(x: jax.Array) -> jax.Array:
    return jnp.sign(x) * jnp.abs(x) ** (1.0 / 3.0)


def cubic_roots_real(a, b, c, d):
    """Real roots of a*x^3 + b*x^2 + c*x + d = 0 (batched scalars).

    Returns (roots [3], valid [3] bool). Invalid entries are filled with the
    first real root, so downstream code can evaluate them safely and rely on
    the mask. Falls back to the quadratic/linear case when ``a`` is tiny.
    """
    dtype = jnp.result_type(a, b, c, d)
    a, b, c, d = (jnp.asarray(v, dtype) for v in (a, b, c, d))
    is_cubic = jnp.abs(a) > 1e-10 * jnp.maximum(
        jnp.maximum(jnp.abs(b), jnp.abs(c)), jnp.maximum(jnp.abs(d), 1.0)
    )
    a_safe = jnp.where(is_cubic, a, jnp.ones((), dtype))

    # Depressed cubic t^3 + p t + q with x = t - b / (3 a).
    shift = b / (3.0 * a_safe)
    p = (3.0 * a_safe * c - b * b) / (3.0 * a_safe * a_safe)
    q = (2.0 * b**3 - 9.0 * a_safe * b * c + 27.0 * a_safe * a_safe * d) / (
        27.0 * a_safe**3
    )
    disc = -4.0 * p**3 - 27.0 * q * q  # >= 0 -> three real roots (repeats at 0)

    # Three-real-roots branch (trigonometric method).
    p_neg = jnp.minimum(p, -_EPS)
    m = 2.0 * jnp.sqrt(-p_neg / 3.0)
    acos_arg = jnp.clip(3.0 * q / (p_neg * m), -1.0, 1.0)
    theta = jnp.arccos(acos_arg) / 3.0
    k = jnp.arange(3, dtype=dtype)
    roots_tri = m * jnp.cos(theta - 2.0 * jnp.pi * k / 3.0)

    # One-real-root branch (Cardano).
    half_q = 0.5 * q
    sq = jnp.sqrt(jnp.maximum(half_q * half_q + p**3 / 27.0, 0.0))
    t_single = _cbrt_signed(-half_q + sq) + _cbrt_signed(-half_q - sq)
    roots_single = jnp.stack([t_single, t_single, t_single])

    # The trigonometric formula remains valid on the disc == 0 boundary
    # (repeated real roots), so route it there too — the Cardano branch
    # would return only one of the two distinct roots.
    three_real = disc >= 0.0
    troots = jnp.where(three_real, roots_tri, roots_single)
    roots = troots - shift
    valid = jnp.where(
        three_real,
        jnp.array([True, True, True]),
        jnp.array([True, False, False]),
    )

    # Quadratic fallback: b x^2 + c x + d = 0.
    is_quad = jnp.abs(b) > 1e-12
    b_safe = jnp.where(is_quad, b, jnp.ones((), dtype))
    qdisc = c * c - 4.0 * b_safe * d
    qs = jnp.sqrt(jnp.maximum(qdisc, 0.0))
    qr0 = (-c - qs) / (2.0 * b_safe)
    qr1 = (-c + qs) / (2.0 * b_safe)
    lin = -d / jnp.where(jnp.abs(c) > _EPS, c, jnp.ones((), dtype))
    quad_roots = jnp.stack([jnp.where(is_quad, qr0, lin), qr1, qr1])
    quad_valid = jnp.stack(
        [
            is_quad & (qdisc >= 0) | ~is_quad,
            is_quad & (qdisc >= 0),
            jnp.zeros((), bool),
        ]
    )

    roots = jnp.where(is_cubic, roots, quad_roots)
    valid = jnp.where(is_cubic, valid, quad_valid)
    return roots, valid


def polish_poly_roots(coeffs: jax.Array, roots: jax.Array, iters: int = 2):
    """Newton-polish roots of a polynomial given coefficients (highest first)."""
    deg = coeffs.shape[-1] - 1
    powers = jnp.arange(deg, -1, -1)

    def horner(x):
        val = jnp.zeros_like(x)
        der = jnp.zeros_like(x)
        for i in range(coeffs.shape[-1]):
            der = der * x + val
            val = val * x + coeffs[..., i]
        return val, der

    del powers
    x = roots
    for _ in range(iters):
        val, der = horner(x)
        step = val / jnp.where(jnp.abs(der) > _EPS, der, jnp.ones_like(der))
        x = x - jnp.clip(step, -1e6, 1e6)
    return x


def quartic_roots_real(coeffs: jax.Array):
    """Real roots of x^4 + a x^3 + b x^2 + c x + d = 0 (monic, Ferrari).

    Args:
      coeffs: [4] array (a, b, c, d).

    Returns:
      (roots [4], valid [4] bool). Invalid lanes duplicate a valid root.
    """
    a, b, c, d = coeffs[0], coeffs[1], coeffs[2], coeffs[3]
    dtype = coeffs.dtype
    # Depress: x = y - a/4 -> y^4 + p y^2 + q y + r.
    a2 = a * a
    p = b - 3.0 * a2 / 8.0
    q = c - a * b / 2.0 + a2 * a / 8.0
    r = d - a * c / 4.0 + a2 * b / 16.0 - 3.0 * a2 * a2 / 256.0

    # Resolvent cubic: 8 m^3 + 8 p m^2 + (2 p^2 - 8 r) m - q^2 = 0.
    m_roots, m_valid = cubic_roots_real(
        jnp.asarray(8.0, dtype), 8.0 * p, 2.0 * p * p - 8.0 * r, -q * q
    )
    # Pick the largest real positive root.
    m_cand = jnp.where(m_valid, m_roots, -jnp.inf)
    m = jnp.max(m_cand)
    m = jnp.maximum(m, 1e-10)

    sqrt2m = jnp.sqrt(2.0 * m)
    q_safe = jnp.where(jnp.abs(sqrt2m) > _EPS, q / sqrt2m, jnp.zeros((), dtype))
    # y^2 +/- sqrt(2m) y + (p/2 + m -/+ q/(2 sqrt(2m))) = 0
    c1 = p / 2.0 + m - q_safe / 2.0
    c2 = p / 2.0 + m + q_safe / 2.0

    def quad(bq, cq):
        disc = bq * bq - 4.0 * cq
        ok = disc >= 0.0
        s = jnp.sqrt(jnp.maximum(disc, 0.0))
        return (-bq - s) / 2.0, (-bq + s) / 2.0, ok

    y0, y1, ok_a = quad(sqrt2m, c1)
    y2, y3, ok_b = quad(-sqrt2m, c2)
    roots = jnp.stack([y0, y1, y2, y3]) - a / 4.0
    valid = jnp.stack([ok_a, ok_a, ok_b, ok_b])
    roots = polish_poly_roots(
        jnp.stack([jnp.ones((), dtype), a, b, c, d]), roots, iters=2
    )
    # Replace invalid lanes with the first valid root for safe evaluation.
    any_valid = jnp.any(valid)
    first_valid = jnp.argmax(valid)
    filler = roots[first_valid]
    roots = jnp.where(valid, roots, filler)
    valid = valid & any_valid
    return roots, valid


def gauss_jordan_solve(M: jax.Array, B: jax.Array):
    """Solve M X = B for tiny static n by unrolled Gauss-Jordan with
    partial pivoting.

    XLA lowers small batched LU/SVD/eigh to serial iterative loops that run
    poorly on TPU; this unrolled elimination is straight-line VPU
    arithmetic (n steps of rank-1 updates) and vmaps cleanly over
    thousands of systems.

    Args:
      M: [n, n]; B: [n, r].
    Returns:
      X [n, r] (garbage if M is singular — callers must validate).
    """
    n = M.shape[0]
    A = jnp.concatenate([M, B], axis=1)
    # Scatter-free implicit pivoting: dynamic-index row swaps would lower
    # to scatters (slow under vmap on TPU); instead the pivot row is
    # selected with a one-hot matvec and all updates are rank-1/elementwise.
    used = jnp.zeros((n,), A.dtype)
    P = jnp.zeros((n, n), A.dtype)  # P[i] = one-hot of step i's pivot row
    for i in range(n):
        col = jnp.abs(A[:, i]) - used * _BIG
        p_onehot = jax.nn.one_hot(jnp.argmax(col), n, dtype=A.dtype)
        pivot_row = p_onehot @ A
        piv = pivot_row[i]
        piv = jnp.where(jnp.abs(piv) > _EPS, piv, _EPS)
        pivot_row = pivot_row / piv
        factors = A[:, i] * (1.0 - p_onehot)
        A = A - factors[:, None] * pivot_row[None, :]
        # Replace the pivot row with its normalized form.
        A = A * (1.0 - p_onehot)[:, None] + p_onehot[:, None] * pivot_row[None, :]
        P = P.at[i].set(p_onehot)  # static index: no scatter
        used = used + p_onehot
    return (P @ A)[:, n:]


def gauss_jordan_solve_lanes(M: jax.Array, B: jax.Array):
    """Batched Gauss-Jordan in LANES-MAJOR layout: the batch axis is LAST.

    Identical math to `gauss_jordan_solve`, but for thousands of tiny
    systems at once. With the conventional [batch, n, n] layout XLA puts
    the length-n axis on the 128 vector lanes (<10% utilization for n <=
    9) and every unrolled elimination step runs at that efficiency —
    measured ~68 ms for 24k 8x9 systems on a v5e. Keeping the batch on
    the trailing axis makes every elimination step a full-width
    elementwise op over the batch.

    Args:
      M: [n, n, B]; B: [n, r, B].
    Returns:
      X [n, r, B] (garbage for singular systems — callers must validate).
    """
    n = M.shape[0]
    A = jnp.concatenate([M, B], axis=1)  # [n, n+r, Bt]
    bt = A.shape[2]
    used = jnp.zeros((n, bt), A.dtype)
    perm = []  # perm[i]: one-hot [n, Bt] of step i's pivot row
    for i in range(n):
        col = jnp.abs(A[:, i, :]) - used * _BIG  # [n, Bt]
        p_onehot = jax.nn.one_hot(jnp.argmax(col, axis=0), n, dtype=A.dtype).T
        pivot_row = jnp.einsum("nb,ncb->cb", p_onehot, A)  # [n+r, Bt]
        piv = pivot_row[i]
        piv = jnp.where(jnp.abs(piv) > _EPS, piv, _EPS)
        pivot_row = pivot_row / piv
        factors = A[:, i, :] * (1.0 - p_onehot)  # [n, Bt]
        A = A - factors[:, None, :] * pivot_row[None, :, :]
        A = (
            A * (1.0 - p_onehot)[:, None, :]
            + p_onehot[:, None, :] * pivot_row[None, :, :]
        )
        perm.append(p_onehot)
        used = used + p_onehot
    P = jnp.stack(perm)  # [n, n, Bt]
    return jnp.einsum("inb,ncb->icb", P, A)[:, n:, :]


def nullspace_exact_lanes(A: jax.Array, n_free: int):
    """Lanes-major batched `nullspace_exact`.

    Args:
      A: [m, m + n_free, B] stacked minimal systems, batch LAST.
    Returns:
      (basis [n_free, m + n_free, B], valid [B] bool).
    """
    m = A.shape[0]
    M = A[:, :m, :]
    B = -A[:, m:, :]
    X = gauss_jordan_solve_lanes(M, B)  # [m, n_free, Bt]
    eye = jnp.eye(n_free, dtype=A.dtype)[:, :, None] * jnp.ones(
        (1, 1, A.shape[2]), A.dtype
    )
    basis = jnp.concatenate([X, eye], axis=0)  # [m+f, f, Bt]
    basis = jnp.swapaxes(basis, 0, 1)  # [f, m+f, Bt]
    norm = jnp.sqrt(jnp.sum(basis * basis, axis=1, keepdims=True))
    basis = basis / jnp.maximum(norm, _EPS)
    # Validate (as in nullspace_exact): normalized basis rows must
    # annihilate A.
    resid = jnp.einsum("mcb,fcb->fmb", A, basis)
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(0, 1)), 1.0)  # [Bt]
    valid = jnp.isfinite(basis).all(axis=(0, 1)) & (
        jnp.max(jnp.abs(resid), axis=(0, 1)) < 1e-3 * scale
    )
    return basis, valid


def nullspace_exact(A: jax.Array, n_free: int):
    """Null-space basis of an [m, m + n_free] exact minimal system.

    Fixes the last n_free columns as free variables and solves the square
    [m, m] system for the rest — the TPU-fast replacement for SVD null
    spaces in minimal solvers. Returns (basis [n_free, m + n_free],
    valid scalar bool). Valid is False when the chosen free columns are
    degenerate (callers fall back to rejecting the hypothesis — RANSAC
    tolerates dropped samples).
    """
    m = A.shape[0]
    M = A[:, :m]
    B = -A[:, m:]
    X = gauss_jordan_solve(M, B)  # [m, n_free]
    eye = jnp.eye(n_free, dtype=A.dtype)
    basis = jnp.concatenate([X.T, eye], axis=1)  # [n_free, m + n_free]
    basis = normalize_vec(basis)
    # Validate: basis rows must actually annihilate A.
    resid = jnp.max(jnp.abs(basis @ A.T))
    scale = jnp.maximum(jnp.max(jnp.abs(A)), 1.0)
    valid = jnp.isfinite(basis).all() & (resid < 1e-3 * scale)
    return basis, valid


def smallest_eigvec_psd(M: jax.Array, iters: int = 6) -> jax.Array:
    """Eigenvector of the smallest eigenvalue of a tiny symmetric PSD
    matrix by shifted inverse iteration with the unrolled GJ solver —
    the TPU-fast replacement for jnp.linalg.eigh in non-minimal refits
    (normal matrices A^T A whose smallest eigenvector is the LSQ
    solution)."""
    n = M.shape[0]
    tr = jnp.trace(M) / n
    shift = jnp.maximum(1e-6 * tr, 1e-12)
    Ms = M + shift * jnp.eye(n, dtype=M.dtype)
    # Deterministic non-symmetric start (breaks alignment with any
    # coordinate axis).
    v = jnp.arange(1, n + 1, dtype=M.dtype)
    v = v / jnp.linalg.norm(v)
    for _ in range(iters):
        v = gauss_jordan_solve(Ms, v[:, None])[:, 0]
        v = v / jnp.maximum(jnp.linalg.norm(v), _EPS)
    return v


def kabsch(src: jax.Array, dst: jax.Array, weights: jax.Array):
    """Weighted rigid alignment: find R, t with dst ~ R @ src + t.

    Args:
      src: [N, 3] source points (e.g. world).
      dst: [N, 3] target points (e.g. camera frame).
      weights: [N] non-negative weights.

    Returns:
      (R [3, 3], t [3], valid bool scalar).
    """
    wsum = jnp.maximum(jnp.sum(weights), _EPS)
    mu_s = jnp.sum(weights[:, None] * src, axis=0) / wsum
    mu_d = jnp.sum(weights[:, None] * dst, axis=0) / wsum
    cs = src - mu_s
    cd = dst - mu_d
    H = (weights[:, None] * cs).T @ cd  # 3x3 cross-covariance
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.array([1.0, 1.0, 1.0], H.dtype)).at[2, 2].set(jnp.sign(det))
    R = Vt.T @ D @ U.T
    t = mu_d - R @ mu_s
    valid = jnp.isfinite(R).all() & jnp.isfinite(t).all()
    return R, t, valid
