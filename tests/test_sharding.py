"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import numpy as np

import jax
import jax.numpy as jnp

from progressivex_tpu.core.config import EngineConfig, make_params
from progressivex_tpu.parallel.sharding import fit_batch, make_mesh


def _scenes(n_scenes, n=128, seed=0):
    """Batch of 2-line scenes."""
    r = np.random.default_rng(seed)
    data = np.zeros((n_scenes, n, 2), np.float32)
    for s in range(n_scenes):
        t = r.uniform(0, 100, n // 2)
        l1 = np.stack([t, 0.5 * t + 5 * s], 1)
        t2 = r.uniform(0, 100, n - n // 2)
        l2 = np.stack([t2, -0.3 * t2 + 60.0], 1)
        data[s] = np.concatenate([l1, l2]) + r.normal(scale=0.2, size=(n, 2))
    mask = np.ones((n_scenes, n), bool)
    weights = np.ones((n_scenes, n), np.float32)
    return jnp.array(data), jnp.array(mask), jnp.array(weights)


CFG = EngineConfig(family="line2d", n_hypotheses=64, max_rounds=4,
                   pearl_iters=2, icm_sweeps=2, sampler_id=0)


def _params(n):
    return make_params(threshold=1.0, confidence=0.95, min_inliers=20,
                       n_valid=n)


def test_fit_batch_vmap_single_device():
    data, mask, w = _scenes(4)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    res = fit_batch("line2d", CFG, _params(128), data, mask, w, keys)
    assert res.n_models.shape == (4,)
    assert np.all(np.asarray(res.n_models) >= 1)


def test_fit_batch_sharded_mesh():
    assert jax.device_count() >= 8, "conftest must force 8 CPU devices"
    mesh = make_mesh(4, 2)
    data, mask, w = _scenes(4)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    res = fit_batch("line2d", CFG, _params(128), data, mask, w, keys, mesh=mesh)
    n_models = np.asarray(res.n_models)
    assert n_models.shape == (4,)
    assert np.all(n_models >= 1), n_models
    assert np.all(np.isfinite(np.asarray(res.descs)))


def test_scene_parallel_matches_vmap():
    """Pure scene sharding (hyp axis 1) must agree with plain vmap modulo
    the hypothesis-axis key fold (axis size 1 -> fold_in(key, 0))."""
    mesh = make_mesh(4, 1)
    data, mask, w = _scenes(4, seed=3)
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    res_sharded = fit_batch("line2d", CFG, _params(128), data, mask, w, keys, mesh=mesh)
    assert np.all(np.asarray(res_sharded.n_models) >= 1)
