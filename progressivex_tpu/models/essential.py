"""Essential-matrix family: data row = [x1, y1, x2, y2] in CALIBRATED
(normalized) image coordinates, descriptor = flattened 3x3 E (row-major)
with x2^T E x1 = 0 and equal non-zero singular values.

Reference parity: the reference ships the five-point Stewenius solver and
essential estimator headers (`/root/reference/src/pyprogressivex/include/
progressive_x.h:19,24` name `estimator_essential_matrix.h` and
`solver_essential_matrix_five_point_stewenius.h`) but exposes no Python
front end; this module provides the same family as a first-class citizen
(SURVEY.md section 2.2, the one solver family with no round-1 counterpart).

TPU-first design of the five-point minimal solver. The classical routes
need double precision: Stewenius's action-matrix eigendecomposition loses
the solutions in f32 (the fixed quotient-basis reduction has condition
numbers up to 1e8 on real data — measured), and degree-10 characteristic
polynomials are hopeless in f32 outright. The design below stays accurate
in f32 and is batched end to end:

  1. The 4-D null space of the 5x9 epipolar system by unrolled
     Gauss-Jordan (ops/linalg.nullspace_exact), then ORTHONORMALIZED
     (ops/linalg.orthonormalize_rows): E(q) = sum_k q_k Ek with q in R^4
     homogeneous and |E(q)| = 1 for unit q. Orthonormality is
     load-bearing, not cosmetic: the constraints in step 2 are
     homogeneous cubics, so on the raw (unit-row, non-orthogonal) RREF
     basis a q near a near-parallel basis direction had |E(q)| << 1 and
     its residual shrank by |E|^3 — fake roots that outranked true ones.
     That scale distortion was the WHOLE historical miss rate: recovery
     0.750 raw vs 0.995 orthonormal (200 noise-free samples, tol 1e-3),
     while 128 vs 512 starts on the raw basis measured IDENTICAL —
     i.e. none of it was missed basins.
  2. The ten Demazure constraints (det E = 0 and
     2 E E^T E - tr(E E^T) E = 0) are evaluated DIRECTLY at E(q) — a few
     3x3 products — and their Jacobian in q by forward-mode AD (E is
     linear in q). An earlier design extracted the 10 x 20
     homogeneous-cubic coefficient matrix by polynomial interpolation at
     20 unit-sphere nodes; the ~1e-5 relative noise that interpolation
     leaves in the coefficients displaced every root whose local
     Jacobian is small (near-double roots) by up to 1e-2, and was the
     DOMINANT loss: recovery measured 0.56 interpolated vs 0.70 direct
     at the same start set, with the direct route also ~25% cheaper.
  3. Solutions are the zeros of the cubic system on the unit sphere S^3,
     found by MULTI-START tangent-space Gauss-Newton: 64 fixed
     unit-sphere starts, 16 damped steps each, with the radial direction
     (a structural Jacobian null direction at any root, by Euler's
     relation for homogeneous polynomials) projected out of every step.
     Starts are embarrassingly parallel on the VPU — the TPU-first axis
     to widen — while extra GN steps serialize; on the orthonormal basis
     64x16 measured 1.00/200 recovery (32 -> 0.985, 96/128 -> 0.995,
     i.e. seed noise past 64).
     Converged, residual-validated points are greedily deduplicated into
     at most 10 solutions (the algebraic count). The dedupe dot
     threshold is 0.9999: genuine distinct roots of one sample pair up
     as close as 1-3 degrees in q-space, so the looser 0.999 threshold
     was measurably absorbing true solutions into a neighbor's cluster
     (recovery 0.700 -> 0.725 from this alone).

Per-sample recovery of the ground-truth solution from noise-free minimal
samples is ~99% in f32 at max|E - E_gt| < 1e-3 (measured 0.995-1.00 over
200 samples; the historical ~75% was entirely the basis-scale
distortion described in step 1). The rare residual miss is absorbed by
the RANSAC engine as a fractionally higher effective sample count,
unlike the eigendecomposition route whose failures were systematic.

The non-minimal refit is the weighted eight-point solve projected onto
the essential manifold without ever decomposing the (degenerate at the
manifold) leading singular pair — see _project_essential.
"""

from __future__ import annotations

import numpy as _np

import jax
import jax.numpy as jnp

from progressivex_tpu.models.base import ModelFamily, register_family
from progressivex_tpu.ops.linalg import (
    gauss_jordan_solve,
    nullspace_exact,
    orthonormalize_rows,
    smallest_eigvec_psd,
)

_EPS = 1e-12
_N_STARTS = 64  # 64 measured at 1.00/200 recovery on the orthonormal
# basis (32 -> 0.985, 96 -> 0.995 — seed noise); the 128 the raw basis
# used buys nothing anymore and halving the start set halves the
# dominant minimal-solver cost.
_N_GN = 16
_MAX_SOL = 10
_DEDUPE_DOT = 0.9999  # see module docstring: 0.999 merges true root pairs

_STARTS_NP = _np.random.default_rng(42).normal(size=(_N_STARTS, 4))
_STARTS_NP /= _np.linalg.norm(_STARTS_NP, axis=1, keepdims=True)
_STARTS = jnp.asarray(_STARTS_NP, jnp.float32)


def _constraints(E):
    """The ten Demazure constraints of an essential matrix. E: [3, 3] ->
    [10] (det + the trace-constraint matrix, row-major)."""
    det = jnp.linalg.det(E)
    EEt = E @ E.T
    C = 2.0 * (EEt @ E) - jnp.trace(EEt) * E
    return jnp.concatenate([det[None], C.reshape(9)])


def _minimal(samples):
    """Five-point solver. samples: [5, 4] -> ([10, 9], [10] bool)."""
    dtype = samples.dtype
    x1, y1 = samples[:, 0], samples[:, 1]
    x2, y2 = samples[:, 2], samples[:, 3]
    o = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], axis=-1
    )  # [5, 9]
    basis, ns_ok = nullspace_exact(A, 4)  # [4, 9]
    # ORTHONORMAL basis rows, so |E(q)| = 1 for every unit q. The raw
    # RREF basis is non-orthogonal; since the Demazure constraints are
    # homogeneous cubics, a q falling in a near-parallel direction of the
    # raw basis had |E(q)| << 1 and its constraint residual shrank by
    # |E|^3 — fake "roots" that outranked the true ones in the converged
    # set. Measured recovery (200 noise-free samples, tol 1e-3):
    # raw 0.750 -> orthonormal 0.995 (ops/linalg.orthonormalize_rows).
    basis, ns_ok = orthonormalize_rows(basis, ns_ok)
    Es = basis.reshape(4, 3, 3)

    # Residual = the ten Demazure constraints evaluated directly at E(q)
    # (E linear in q, so the Jacobian in q is exact forward-mode AD).
    # See the module docstring for why this beats the former interpolated
    # cubic-coefficient route in f32.
    def resid(q):
        return _constraints(jnp.einsum("k,kij->ij", q, Es))

    jac = jax.jacfwd(resid)

    def gn(q0):
        q = q0
        for _ in range(_N_GN):
            r = resid(q)
            J = jac(q)  # [10, 4]
            # Project out the radial direction: J q = 3 r (Euler), so at a
            # root the Jacobian is structurally singular along q and the
            # raw normal equations blow the step up.
            Jt = J - jnp.outer(J @ q, q)
            H = Jt.T @ Jt + 1e-9 * jnp.eye(4, dtype=dtype)
            d = gauss_jordan_solve(H, (Jt.T @ r)[:, None])[:, 0]
            d = d - (d @ q) * q
            q = q - d
            q = q / jnp.maximum(jnp.linalg.norm(q), _EPS)
        return q, jnp.linalg.norm(resid(q))

    qs, res = jax.vmap(gn)(_STARTS)  # [S, 4], [S]
    converged = res < 1e-4

    # Greedy dedupe into _MAX_SOL solutions (antipodal points are the same
    # solution, so compare |q . q'|).
    score = jnp.where(converged, res, jnp.inf)
    out_q, out_ok = [], []
    for _ in range(_MAX_SOL):
        i = jnp.argmin(score)
        ok = jnp.isfinite(score[i])
        q = qs[i]
        out_q.append(q)
        out_ok.append(ok)
        dup = jnp.abs(qs @ q) > _DEDUPE_DOT
        score = jnp.where(dup, jnp.inf, score)
    Q = jnp.stack(out_q)  # [10, 4]
    okv = jnp.stack(out_ok)

    Esol = jnp.einsum("sk,kij->sij", Q, Es)
    nrm = jnp.sqrt(jnp.sum(Esol * Esol, axis=(1, 2)))
    Esol = Esol / jnp.maximum(nrm, _EPS)[:, None, None]
    epip = jax.vmap(
        lambda E: jnp.max(jnp.abs(jnp.einsum(
            "ni,ij,nj->n",
            jnp.stack([x2, y2, o], -1), E, jnp.stack([x1, y1, o], -1),
        )))
    )(Esol)
    valid = okv & ns_ok & jnp.isfinite(Esol).all(axis=(1, 2)) & (epip < 1e-3)

    # Oriented epipolar (cheirality) constraint on the minimal sample —
    # the same validity rule the fundamental family applies (see
    # models/fundamental._minimal; GC-RANSAC estimator isValidModel
    # parity): the sign of (e2 x x2_i) . (E x1_i) must agree across the
    # five sample points for a physically realizable relative pose.
    # Kills mixed-motion bridge models before they can win raw support.
    x1h = jnp.stack([x1, y1, o], axis=-1)  # [5, 3]
    x2h = jnp.stack([x2, y2, o], axis=-1)

    def oriented_ok(E):
        cands = jnp.stack([
            jnp.cross(E[:, 0], E[:, 1]),
            jnp.cross(E[:, 0], E[:, 2]),
            jnp.cross(E[:, 1], E[:, 2]),
        ])
        pick = jnp.sum(cands * cands, axis=1)
        e2 = jnp.sum(
            cands * jax.nn.one_hot(jnp.argmax(pick), 3)[:, None], axis=0)
        lines = x1h @ E.T
        s = jnp.sum(jnp.cross(jnp.broadcast_to(e2, x2h.shape), x2h)
                    * lines, axis=-1)
        return jnp.all(s > 0.0) | jnp.all(s < 0.0)

    valid = valid & jax.vmap(oriented_ok)(Esol)
    return Esol.reshape(_MAX_SOL, 9), valid


def _complement_basis(v):
    """Orthonormal basis [3, 2] of the plane orthogonal to unit vector v."""
    t = jax.nn.one_hot(jnp.argmin(jnp.abs(v)), 3, dtype=v.dtype)
    a = t - (t @ v) * v
    a = a / jnp.maximum(jnp.linalg.norm(a), _EPS)
    b = jnp.cross(v, a)
    return jnp.stack([a, b], axis=1)


def _project_essential(E):
    """Nearest essential matrix (equal leading singular values, zero
    smallest) WITHOUT decomposing the degenerate leading singular pair:
    for inputs at or near the essential manifold the top two singular
    values coincide and any eigenvector-based route for them is
    numerically undefined (this exact failure collapsed refits to rank 1).
    Only the SMALLEST singular pair — well separated by ~sigma/2 — is
    extracted (inverse iteration); the leading part is handled as a 2x2
    block in the complements, whose polar factor and singular-value sum
    have closed forms."""
    v3 = smallest_eigvec_psd(E.T @ E)
    u3 = smallest_eigvec_psd(E @ E.T)
    Bv = _complement_basis(v3)  # [3, 2]
    Bu = _complement_basis(u3)
    M2 = Bu.T @ E @ Bv  # [2, 2] the leading singular block
    a, b = M2[0, 0], M2[0, 1]
    c, d = M2[1, 0], M2[1, 1]
    det = a * d - b * c
    # Closed-form 2x2 polar factor and s1 + s2 (rotation branch for
    # det >= 0, reflection branch otherwise).
    h_rot = jnp.sqrt(jnp.maximum((a + d) ** 2 + (b - c) ** 2, _EPS))
    h_ref = jnp.sqrt(jnp.maximum((a - d) ** 2 + (b + c) ** 2, _EPS))
    Q_rot = jnp.array([[a + d, b - c], [c - b, a + d]]) / h_rot
    Q_ref = jnp.array([[a - d, b + c], [b + c, d - a]]) / h_ref
    pos = det >= 0.0
    Q = jnp.where(pos, Q_rot, Q_ref)
    ssum = jnp.where(pos, h_rot, h_ref)  # = s1 + s2
    Ep = 0.5 * ssum * (Bu @ Q @ Bv.T)
    nrm = jnp.sqrt(jnp.sum(Ep * Ep))
    return Ep / jnp.maximum(nrm, _EPS)


def _nonminimal(data, weights):
    """Weighted eight-point solve + projection to the essential manifold.
    Calibrated coordinates are already conditioned; no Hartley transform."""
    sw = jnp.sqrt(jnp.maximum(weights, 0.0))
    x1, y1 = data[:, 0], data[:, 1]
    x2, y2 = data[:, 2], data[:, 3]
    o = jnp.ones_like(x1)
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, o], axis=-1
    ) * sw[:, None]
    M = A.T @ A
    e = smallest_eigvec_psd(M)
    E = _project_essential(e.reshape(3, 3))
    valid = jnp.isfinite(E).all() & (jnp.sum(weights > 0) >= 8)
    return E.reshape(9), valid


def _squared_residual(data, desc):
    """Squared Sampson distance in calibrated coordinates. [N, 4] -> [N]."""
    E = desc.reshape(3, 3)
    x1, y1 = data[:, 0], data[:, 1]
    x2, y2 = data[:, 2], data[:, 3]
    fx0 = E[0, 0] * x1 + E[0, 1] * y1 + E[0, 2]
    fx1 = E[1, 0] * x1 + E[1, 1] * y1 + E[1, 2]
    fx2 = E[2, 0] * x1 + E[2, 1] * y1 + E[2, 2]
    ftx0 = E[0, 0] * x2 + E[1, 0] * y2 + E[2, 0]
    ftx1 = E[0, 1] * x2 + E[1, 1] * y2 + E[2, 1]
    num = x2 * fx0 + y2 * fx1 + fx2
    den = fx0 * fx0 + fx1 * fx1 + ftx0 * ftx0 + ftx1 * ftx1
    return num * num / jnp.maximum(den, _EPS)


ESSENTIAL = register_family(
    ModelFamily(
        name="essential",
        data_dim=4,
        sample_size=5,
        nonminimal_min=8,
        max_solutions=_MAX_SOL,
        desc_dim=9,
        desc_shape=(3, 3),
        minimal_solver=_minimal,
        nonminimal_solver=_nonminimal,
        squared_residual=_squared_residual,
    )
)
