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


def orthonormalize_rows(basis: jax.Array, valid: jax.Array):
    """Modified Gram-Schmidt over the rows of a small [f, c] basis.

    `nullspace_exact`'s RREF-style basis has unit rows but is NOT
    orthogonal, so a unit coefficient vector q gives |sum_k q_k basis_k|
    anywhere in [sigma_min, sigma_max] of the row set. Any solver that
    ranks or thresholds a HOMOGENEOUS residual of that combination (the
    five-point solver's cubic Demazure constraints scale with |E|^3) is
    then scale-distorted: combinations falling in a near-parallel
    direction of the basis evaluate artificially small and "converge"
    far from any true root. Measured on the five-point solver's
    noise-free recovery benchmark (200 samples): raw basis 0.750,
    orthonormalized 0.995 — the entire miss rate was this distortion,
    not missed Gauss-Newton basins (128 vs 512 starts measured
    IDENTICAL at 0.750 on the raw basis).

    Returns (orthonormal basis, valid & rows-independent)."""
    rows = []
    for i in range(basis.shape[0]):
        v = basis[i]
        for u in rows:
            v = v - (v @ u) * u
        n = jnp.linalg.norm(v)
        valid = valid & (n > 1e-6)
        rows.append(v / jnp.maximum(n, _EPS))
    return jnp.stack(rows), valid


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


def charpoly_coeffs(T: jax.Array) -> jax.Array:
    """Characteristic-polynomial coefficients of a small square matrix by
    the Faddeev-LeVerrier recursion (n matmuls + traces — no eigensolver).

    Args:
      T: [n, n].
    Returns:
      coeffs [n + 1], highest power first (monic):
      p(l) = l^n + c[1] l^(n-1) + ... + c[n].
    """
    n = T.shape[0]
    eye = jnp.eye(n, dtype=T.dtype)
    coeffs = [jnp.ones((), T.dtype)]
    M = jnp.zeros_like(T)
    c = jnp.ones((), T.dtype)
    for k in range(1, n + 1):
        M = T @ (M + c * eye)
        c = -jnp.trace(M) / k
        coeffs.append(c)
    return jnp.stack(coeffs)


def poly_real_roots_grid(coeffs: jax.Array, n_grid: int = 256,
                         n_bisect: int = 40, n_newton: int = 2):
    """Real roots of a monic polynomial by sign-change isolation.

    Closed-form root formulas stop at the quartic and TPU has no native
    nonsymmetric eigensolver for companion matrices, so roots of the
    degree-10 polynomials in the five-point solver are found the
    hardware-friendly way: evaluate the polynomial on a fixed grid over
    the Cauchy root bound, bisect every sign-change interval (static trip
    count, fully batched), and Newton-polish. Even-multiplicity roots
    that touch zero without crossing are missed — for RANSAC hypothesis
    generation that is a measure-zero loss.

    Args:
      coeffs: [d + 1] monic, highest first.
    Returns:
      (roots [d], valid [d] bool) — invalid lanes padded with 0.
    """
    d = coeffs.shape[0] - 1

    def horner(x):
        val = jnp.zeros_like(x)
        for i in range(d + 1):
            val = val * x + coeffs[i]
        return val

    def horner_d(x):
        val = jnp.zeros_like(x)
        der = jnp.zeros_like(x)
        for i in range(d + 1):
            der = der * x + val
            val = val * x + coeffs[i]
        return val, der

    bound = 1.0 + jnp.max(jnp.abs(coeffs[1:]))
    xs = jnp.linspace(-1.0, 1.0, n_grid) * bound
    vals = horner(xs)
    sign_change = (vals[:-1] * vals[1:]) <= 0.0  # [n_grid - 1]
    # Keep the d leftmost sign-change intervals (a degree-d poly has at
    # most d real roots; tie intervals beyond that are duplicates).
    order = jnp.argsort(~sign_change)  # True (changes) first, stable
    picked = order[:d]
    valid = sign_change[picked]
    lo = xs[picked]
    hi = xs[picked + 1]
    flo = horner(lo)

    def bisect(carry, _):
        lo, hi, flo = carry
        mid = 0.5 * (lo + hi)
        fmid = horner(mid)
        go_left = (flo * fmid) <= 0.0
        return (
            jnp.where(go_left, lo, mid),
            jnp.where(go_left, mid, hi),
            jnp.where(go_left, flo, fmid),
        ), None

    (lo, hi, _), _ = jax.lax.scan(bisect, (lo, hi, flo), None, length=n_bisect)
    roots = 0.5 * (lo + hi)
    for _ in range(n_newton):
        val, der = horner_d(roots)
        step = val / jnp.where(jnp.abs(der) > _EPS, der, jnp.ones_like(der))
        roots = roots - jnp.clip(step, -1.0, 1.0)
    return jnp.where(valid, roots, 0.0), valid


def null_eigvec(M: jax.Array, iters: int = 3) -> jax.Array:
    """Approximate null vector (eigenvector of the eigenvalue nearest 0)
    of a small square, possibly NON-symmetric matrix by shift-regularized
    inverse iteration with the unrolled GJ solver."""
    n = M.shape[0]
    scale = jnp.maximum(jnp.max(jnp.abs(M)), _EPS)
    Ms = M + (1e-5 * scale) * jnp.eye(n, dtype=M.dtype)
    v = jnp.arange(1, n + 1, dtype=M.dtype)
    v = v / jnp.linalg.norm(v)
    for _ in range(iters):
        v = gauss_jordan_solve(Ms, v[:, None])[:, 0]
        v = v / jnp.maximum(jnp.linalg.norm(v), _EPS)
    return v


def eigh3x3(S: jax.Array):
    """Closed-form eigendecomposition of a symmetric 3x3 matrix
    (trigonometric method). Returns (eigvals [3] ascending, eigvecs [3, 3]
    columns). The TPU-fast replacement for jnp.linalg.eigh at this size."""
    dtype = S.dtype
    q = jnp.trace(S) / 3.0
    B = S - q * jnp.eye(3, dtype=dtype)
    p2 = jnp.sum(B * B) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    detB = jnp.linalg.det(B / jnp.where(p > _EPS, p, 1.0))
    r = jnp.clip(detB / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # Eigenvalues of S: q + 2 p cos(phi + 2 pi k / 3), k = 0, 1, 2.
    e0 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    e2 = q + 2.0 * p * jnp.cos(phi)  # largest
    e1 = 3.0 * q - e0 - e2
    vals = jnp.stack([e0, e1, e2])

    def eigvec(lam):
        # Null vector of S - lam I via cross products of its rows (the two
        # most independent rows give the most stable normal direction).
        A = S - lam * jnp.eye(3, dtype=dtype)
        c01 = jnp.cross(A[0], A[1])
        c02 = jnp.cross(A[0], A[2])
        c12 = jnp.cross(A[1], A[2])
        cands = jnp.stack([c01, c02, c12])
        norms = jnp.linalg.norm(cands, axis=1)
        best = jnp.argmax(norms)
        v = cands[best]
        return v / jnp.maximum(jnp.linalg.norm(v), _EPS)

    vecs = jnp.stack([eigvec(vals[i]) for i in range(3)], axis=1)
    return vals, vecs


def hessenberg(T: jax.Array) -> jax.Array:
    """Upper-Hessenberg reduction of a small square matrix by unrolled,
    masked Householder reflections (static shapes, batch-friendly)."""
    n = T.shape[0]
    H = T
    idx = jnp.arange(n)
    for k in range(n - 2):
        col = jnp.where(idx > k, H[:, k], 0.0)
        nrm = jnp.sqrt(jnp.sum(col * col))
        pivot = col[k + 1]
        alpha = -jnp.sign(jnp.where(pivot == 0.0, 1.0, pivot)) * nrm
        v = col - alpha * (idx == k + 1).astype(T.dtype)
        vn = jnp.sqrt(jnp.sum(v * v))
        v = jnp.where(vn > _EPS, v / jnp.maximum(vn, _EPS), v)
        # H <- (I - 2vv^T) H (I - 2vv^T)
        H = H - 2.0 * jnp.outer(v, v @ H)
        H = H - 2.0 * jnp.outer(H @ v, v)
    return H


def _hyman_sign_fn(H: jax.Array):
    """Returns g(lam) with sign(g) == sign(det(H - lam I) / prod(subdiag))
    for an upper-Hessenberg H, evaluated by Hyman's recurrence with
    positive rescaling (stable sign tracking; batched over lam)."""
    n = H.shape[0]
    sub = jnp.diagonal(H, offset=-1)  # [n-1]
    sub_safe = jnp.where(jnp.abs(sub) > 1e-20, sub, 1e-20)

    def g(lams):
        G = lams.shape[0]
        x = jnp.zeros((n, G), H.dtype).at[n - 1].set(1.0)
        logscale = jnp.zeros((G,), H.dtype)
        for i in range(n - 2, -1, -1):
            row = H[i + 1]  # row i+1 touches x_j for j >= i
            s = row[i + 1:] @ x[i + 1:] - lams * x[i + 1]
            xi = -s / sub_safe[i]
            x = x.at[i].set(xi)
            m = jnp.max(jnp.abs(x), axis=0)
            m = jnp.where(m > 1e10, m, 1.0)
            x = x / m
        val = H[0] @ x - lams * x[0]
        del logscale
        return val

    return g


def balance_matrix(T: jax.Array, n_sweeps: int = 6) -> jax.Array:
    """Osborne balancing by powers of two: a diagonal similarity that
    equalizes row/column norms. Eigenvalues are unchanged, but the norm
    (and hence any root bound used downstream) can drop by orders of
    magnitude for the badly scaled action matrices the five-point solver
    produces."""
    n = T.shape[0]
    B = T
    eye_mask = jnp.eye(n, dtype=bool)
    for _ in range(n_sweeps):
        off = jnp.where(eye_mask, 0.0, B)
        r = jnp.sum(jnp.abs(off), axis=1)  # row norms
        c = jnp.sum(jnp.abs(off), axis=0)  # col norms
        f = jnp.sqrt(jnp.maximum(c, _EPS) / jnp.maximum(r, _EPS))
        f = jnp.exp2(jnp.round(jnp.log2(jnp.clip(f, 1e-8, 1e8))))
        f = jnp.where((r > _EPS) & (c > _EPS), f, 1.0)
        B = B * f[:, None] / f[None, :]
    return B


def real_eigvals_hessenberg(T: jax.Array, n_grid: int = 512,
                            n_bisect: int = 45):
    """Real eigenvalues of a small square NON-symmetric matrix, the
    TPU-friendly way: Hessenberg reduction, then sign-change isolation of
    det(H - lam I) via Hyman's recurrence on a grid over the Gershgorin
    bound + bisection. No QR iteration, no complex arithmetic; complex
    pairs are simply never detected (the callers want real solutions
    only). Even-multiplicity real eigenvalues that do not produce a sign
    change are missed — a measure-zero loss for hypothesis generation.

    Returns (eigvals [n], valid [n] bool).
    """
    n = T.shape[0]
    Tb = balance_matrix(T)
    H = hessenberg(Tb)
    g = _hyman_sign_fn(H)
    bound = jnp.max(jnp.sum(jnp.abs(Tb), axis=1)) + 1e-3
    xs = jnp.linspace(-1.0, 1.0, n_grid) * bound
    vals = g(xs)
    sign_change = (vals[:-1] * vals[1:]) <= 0.0
    order = jnp.argsort(~sign_change)
    picked = order[:n]
    valid = sign_change[picked]
    lo, hi = xs[picked], xs[picked + 1]
    flo = g(lo)

    def bisect(carry, _):
        lo, hi, flo = carry
        mid = 0.5 * (lo + hi)
        fmid = g(mid)
        go_left = (flo * fmid) <= 0.0
        return (
            jnp.where(go_left, lo, mid),
            jnp.where(go_left, mid, hi),
            jnp.where(go_left, flo, fmid),
        ), None

    (lo, hi, _), _ = jax.lax.scan(bisect, (lo, hi, flo), None, length=n_bisect)
    roots = 0.5 * (lo + hi)
    return jnp.where(valid, roots, 0.0), valid
