"""Public batched API over a device mesh: parity vs the single-device path.

The `mesh=`/`n_devices=` kwargs of the find*Batched front ends shard the
row axis across a ("scenes","hyp") mesh via shard_map (api_batch.
_compiled_fit_rows). Sharding must not change results: every row runs the
same per-row computation with the same key, so descriptors and labelings
must match the unsharded run exactly (same dtype, same reduction order
within a row). Runs on the virtual 8-device CPU mesh from conftest.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from progressivex_tpu.api_batch import (  # noqa: E402
    findHomographiesBatched,
    findTwoViewMotionsBatched,
)


def _scenes(n_scenes=3, n=160, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for s in range(n_scenes):
        Hs = [
            np.array([[1.0, 0.05 * s, 30.0], [0.0, 1.0, -5.0 * s],
                      [0.0, 0.0, 1.0]]),
            np.array([[0.9, 0.1, -20.0], [-0.1, 1.1, 30.0],
                      [0.0, 0.0, 1.0]]),
        ]
        per = n // 3
        corrs = []
        for H in Hs:
            p1 = rng.uniform(0, 200, (per, 2))
            ph = np.concatenate([p1, np.ones((per, 1))], 1) @ H.T
            p2 = ph[:, :2] / ph[:, 2:3] + rng.normal(scale=0.5, size=(per, 2))
            corrs.append(np.concatenate([p1, p2], 1))
        corrs.append(rng.uniform(0, 200, (n - 2 * per, 4)))
        out.append(np.concatenate(corrs))
    return out


KW = dict(threshold=3.0, conf=0.9, spatial_coherence_weight=0.1,
          neighborhood_ball_radius=50.0, maximum_tanimoto_similarity=0.4,
          max_iters=128, minimum_point_number=16, maximum_model_number=4,
          random_seed=7)


def test_homographies_mesh_parity():
    scenes = _scenes()
    ref = findHomographiesBatched(scenes, **KW)
    got = findHomographiesBatched(scenes, **KW, n_devices=8)
    for (d0, l0), (d1, l1) in zip(ref, got):
        np.testing.assert_array_equal(l0, l1)
        np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-6)


def test_two_view_motions_mesh_parity_with_restarts():
    scenes = _scenes(n_scenes=2, seed=3)
    kw = dict(KW, threshold=1.0, n_restarts=2, magsac_levels=2,
              final_relabel=1)
    ref = findTwoViewMotionsBatched(scenes, **kw)
    got = findTwoViewMotionsBatched(scenes, **kw, n_devices=4)
    for (d0, l0), (d1, l1) in zip(ref, got):
        np.testing.assert_array_equal(l0, l1)
        np.testing.assert_allclose(d0, d1, rtol=1e-5, atol=1e-6)


def test_mesh_rejects_missing_scenes_axis():
    import jax
    from jax.sharding import Mesh

    devs = np.asarray(jax.devices()[:2]).reshape(2)
    bad = Mesh(devs, ("x",))
    with pytest.raises(ValueError, match="scenes"):
        findHomographiesBatched(_scenes(1), **KW, mesh=bad)
