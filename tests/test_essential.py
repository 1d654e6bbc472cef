"""Essential-matrix family tests: five-point minimal solver recovery on
synthetic calibrated scenes, non-minimal refit + manifold projection, and
an end-to-end multi-E fit through the findEssentialMatrices front end
(an extension — the reference ships the solver headers but no binding,
`progressive_x.h:19,24`)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from progressivex_tpu.models.essential import (
    _minimal,
    _nonminimal,
    _project_essential,
    _squared_residual,
)


def _synth_motion(seed, n=5, noise=0.0):
    r = np.random.default_rng(seed)
    ax = r.normal(size=3)
    ax /= np.linalg.norm(ax)
    th = r.uniform(0.1, 0.5)
    K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]], [-ax[1], ax[0], 0]])
    R = np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * K @ K
    t = r.normal(size=3)
    t /= np.linalg.norm(t)
    Tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = Tx @ R
    X = r.uniform(-1, 1, (n, 3)) + np.array([0, 0, 4.0])
    x1 = X[:, :2] / X[:, 2:3]
    Xc = X @ R.T + t
    x2 = Xc[:, :2] / Xc[:, 2:3]
    corr = np.concatenate([x1, x2], 1)
    corr += r.normal(0, noise, corr.shape)
    return E / np.linalg.norm(E), corr


def _best_err(descs, valid, E_gt):
    best = np.inf
    for d, v in zip(np.asarray(descs), np.asarray(valid)):
        if v:
            E = d.reshape(3, 3)
            best = min(best, min(np.abs(E - E_gt).max(),
                                 np.abs(E + E_gt).max()))
    return best


def test_five_point_recovers_gt_often():
    """f32 multi-start recovery is ~99% per noise-free minimal sample at
    the 1e-3 tolerance since the nullspace basis is ORTHONORMALIZED
    (measured 0.995-1.00 over 200 samples at 64 starts; the raw RREF
    basis scored 0.750 regardless of start count — the homogeneous
    Demazure residual was scale-distorted, see the module docstring and
    ops/linalg.orthonormalize_rows). Gate at 37/40 (~3 sigma below the
    0.985 worst measured rate)."""
    mm = jax.jit(_minimal)
    hits = 0
    for seed in range(40):
        E_gt, corr = _synth_motion(seed)
        descs, valid = mm(jnp.array(corr, jnp.float32))
        hits += _best_err(descs, valid, E_gt) < 1e-3
    assert hits >= 37, f"only {hits}/40 minimal problems recovered"


def test_five_point_solutions_satisfy_constraints():
    E_gt, corr = _synth_motion(1)
    descs, valid = _minimal(jnp.array(corr, jnp.float32))
    descs, valid = np.asarray(descs), np.asarray(valid)
    assert valid.any()
    for d, v in zip(descs, valid):
        if not v:
            continue
        E = d.reshape(3, 3)
        # Rank 2 + equal-singular-value (Demazure) constraints, loosely.
        assert abs(np.linalg.det(E)) < 5e-2
        r2 = np.asarray(_squared_residual(jnp.array(corr, jnp.float32),
                                          jnp.array(d)))
        assert r2.max() < 1e-4  # epipolar-consistent with all 5 points


def test_nonminimal_refit_and_projection():
    E_gt, corr = _synth_motion(0, n=60, noise=1e-3)
    d, ok = _nonminimal(jnp.array(corr, jnp.float32), jnp.ones(60))
    assert bool(ok)
    E = np.asarray(d).reshape(3, 3)
    assert min(np.abs(E - E_gt).max(), np.abs(E + E_gt).max()) < 0.08
    # The projection must keep essential singular structure (s, s, 0) even
    # for inputs already ON the manifold (degenerate leading pair).
    s = np.linalg.svd(np.asarray(_project_essential(jnp.array(E_gt,
        jnp.float32))), compute_uv=False)
    np.testing.assert_allclose(s[0], s[1], rtol=1e-4)
    assert s[2] < 1e-5


def test_find_essential_matrices_end_to_end():
    from progressivex_tpu import findEssentialMatrices

    K = np.array([[800.0, 0, 320], [0, 800.0, 240], [0, 0, 1]])
    rng = np.random.default_rng(0)
    corrs, gt = [], []
    for mi in range(2):
        E_gt, corr = _synth_motion(mi + 10, n=120, noise=5e-4)
        px1 = (np.concatenate([corr[:, :2], np.ones((120, 1))], 1) @ K.T)[:, :2]
        px2 = (np.concatenate([corr[:, 2:], np.ones((120, 1))], 1) @ K.T)[:, :2]
        corrs.append(np.concatenate([px1, px2], 1))
        gt += [mi + 1] * 120
    out = rng.uniform(0, 640, (60, 4))
    corrs.append(out)
    gt += [0] * 60
    corrs = np.concatenate(corrs)
    Es, labels = findEssentialMatrices(
        corrs, K, K, threshold=1.5, minimum_point_number=20,
        maximum_model_number=3, max_iters=1000, random_seed=0,
    )
    k = Es.shape[0] // 3
    assert k >= 2, f"expected >= 2 essential matrices, got {k}"
    # Most points of each GT motion share a label.
    gt = np.array(gt)
    for mi in (1, 2):
        lab = labels[gt == mi]
        top = np.bincount(lab[lab < k], minlength=k).max() if (lab < k).any() else 0
        assert top > 60, f"motion {mi}: largest cluster {top}/120"
