"""Unit tests for the TPU-fast linear-algebra replacements (unrolled
Gauss-Jordan, exact null spaces, inverse-iteration eigenvectors) against
NumPy/eigh oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from progressivex_tpu.ops.linalg import (
    cubic_roots_real,
    gauss_jordan_solve,
    nullspace_exact,
    quartic_roots_real,
    smallest_eigvec_psd,
)


def test_gauss_jordan_matches_numpy():
    r = np.random.default_rng(0)
    for n in (3, 8, 9, 12):
        M = r.normal(size=(n, n))
        B = r.normal(size=(n, 2))
        X = gauss_jordan_solve(jnp.array(M, jnp.float32), jnp.array(B, jnp.float32))
        np.testing.assert_allclose(np.asarray(X), np.linalg.solve(M, B), atol=1e-3)


def test_gauss_jordan_needs_pivoting():
    # Leading zero pivot: naive elimination would blow up.
    M = np.array([[0.0, 1.0], [1.0, 0.0]])
    B = np.array([[2.0], [3.0]])
    X = gauss_jordan_solve(jnp.array(M), jnp.array(B))
    np.testing.assert_allclose(np.asarray(X), [[3.0], [2.0]], atol=1e-6)


def test_gauss_jordan_vmap():
    r = np.random.default_rng(1)
    M = jnp.array(r.normal(size=(64, 8, 8)), jnp.float32)
    B = jnp.array(r.normal(size=(64, 8, 1)), jnp.float32)
    X = jax.jit(jax.vmap(gauss_jordan_solve))(M, B)
    want = np.linalg.solve(np.asarray(M, np.float64), np.asarray(B, np.float64))
    np.testing.assert_allclose(np.asarray(X), want, atol=1e-2)


def test_nullspace_exact_one_dim():
    r = np.random.default_rng(2)
    # Build an 8x9 matrix with a known null vector.
    h = r.normal(size=9)
    h /= np.linalg.norm(h)
    A = r.normal(size=(8, 9))
    A -= np.outer(A @ h, h)  # force A h = 0
    basis, valid = nullspace_exact(jnp.array(A, jnp.float32), 1)
    assert bool(valid)
    v = np.asarray(basis[0])
    assert abs(abs(v @ h) - 1.0) < 1e-3  # equal up to sign


def test_nullspace_exact_two_dim():
    r = np.random.default_rng(3)
    # Orthonormal null pair (projecting against a non-orthogonal pair
    # alternately does not converge).
    H, _ = np.linalg.qr(r.normal(size=(9, 2)))
    A = r.normal(size=(7, 9))
    A -= (A @ H) @ H.T
    basis, valid = nullspace_exact(jnp.array(A, jnp.float32), 2)
    assert bool(valid)
    B = np.asarray(basis)
    # The true null vectors must lie in the span of the returned basis.
    for hn in H.T:
        proj = B.T @ np.linalg.lstsq(B.T, hn, rcond=None)[0]
        assert np.linalg.norm(proj - hn) < 1e-2


def test_smallest_eigvec_psd_matches_eigh():
    r = np.random.default_rng(4)
    for n in (3, 9, 12):
        Q = r.normal(size=(n, n))
        M = Q.T @ Q + np.eye(n)
        # Shrink the smallest eigenvalue to make a clear target.
        w, V = np.linalg.eigh(M)
        w[0] *= 1e-3
        M = (V * w) @ V.T
        v = np.asarray(smallest_eigvec_psd(jnp.array(M, jnp.float32)))
        target = V[:, 0]
        assert abs(abs(v @ target) - 1.0) < 1e-3, (n, v, target)


def test_root_solvers():
    # cubic with known roots 1, 2, 3: x^3 - 6x^2 + 11x - 6
    roots, valid = cubic_roots_real(1.0, -6.0, 11.0, -6.0)
    got = np.sort(np.asarray(roots)[np.asarray(valid)])
    np.testing.assert_allclose(got, [1.0, 2.0, 3.0], atol=1e-4)
    # quartic with roots -2, -1, 1, 3: expand (x+2)(x+1)(x-1)(x-3)
    # = x^4 - x^3 - 7x^2 + x + 6
    roots, valid = quartic_roots_real(jnp.array([-1.0, -7.0, 1.0, 6.0]))
    got = np.sort(np.asarray(roots)[np.asarray(valid)])
    np.testing.assert_allclose(got, [-2.0, -1.0, 1.0, 3.0], atol=1e-3)
