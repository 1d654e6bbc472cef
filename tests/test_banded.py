"""Banded-adjacency parity vs the dense representation, and engine-level
restart selection.

The block-banded Potts adjacency (ops/labeling.BandedAdj) must agree
exactly with the dense [N, N] one-hot adjacency whenever every kNN edge
falls inside the band — which is guaranteed here by construction (points
sorted along one axis, band wider than the largest index gap)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from progressivex_tpu.ops.knn import knn_graph
from progressivex_tpu.ops.labeling import (
    BandedAdj,
    adjacency_banded,
    adjacency_from_knn,
    degrees,
    icm_sweeps,
    labeling_energy,
    neighbor_label_counts,
    neighbor_mean,
    data_costs,
)


@pytest.fixture(scope="module")
def sorted_cloud():
    r = np.random.default_rng(0)
    n = 640
    # Clustered 2-D points, sorted by x so kNN edges are index-local.
    pts = np.concatenate([
        r.normal([i * 40.0, 10.0 * (i % 3)], 3.0, size=(n // 4, 2))
        for i in range(4)
    ]).astype(np.float32)
    pts = pts[np.argsort(pts[:, 0])]
    mask = np.ones((n,), bool)
    idx, kmask = knn_graph(jnp.array(pts), jnp.array(mask), 50.0, 8)
    return pts, idx, kmask


def test_banded_matches_dense_counts(sorted_cloud):
    pts, idx, kmask = sorted_cloud
    n = pts.shape[0]
    dense = adjacency_from_knn(idx, kmask)
    band = adjacency_banded(idx, kmask, half_width=192)
    assert isinstance(band, BandedAdj)
    # All edges are within the band for this sorted cloud.
    np.testing.assert_allclose(
        np.asarray(degrees(band)), np.asarray(degrees(dense)))
    labels = jnp.array(np.random.default_rng(1).integers(0, 5, n), jnp.int32)
    c_dense = neighbor_label_counts(dense, labels, 5)
    c_band = neighbor_label_counts(band, labels, 5)
    np.testing.assert_allclose(np.asarray(c_band), np.asarray(c_dense))


def test_banded_matches_dense_mean_and_energy(sorted_cloud):
    pts, idx, kmask = sorted_cloud
    n = pts.shape[0]
    dense = adjacency_from_knn(idx, kmask)
    band = adjacency_banded(idx, kmask, half_width=192)
    r = np.random.default_rng(2)
    vals = jnp.array(r.uniform(0, 1, n), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(neighbor_mean(band, vals)),
        np.asarray(neighbor_mean(dense, vals)), atol=1e-5)
    labels = jnp.array(r.integers(0, 4, n), jnp.int32)
    r2 = jnp.array(r.uniform(0, 20, (3, n)), jnp.float32)
    dcost = data_costs(r2, jnp.ones((3,), bool), jnp.ones((n,), bool),
                       0.3, 9.0)
    e_dense = labeling_energy(dcost, labels, dense, 0.3)
    e_band = labeling_energy(dcost, labels, band, 0.3)
    np.testing.assert_allclose(float(e_band), float(e_dense), rtol=1e-6)


def test_banded_icm_matches_dense(sorted_cloud):
    pts, idx, kmask = sorted_cloud
    n = pts.shape[0]
    dense = adjacency_from_knn(idx, kmask)
    band = adjacency_banded(idx, kmask, half_width=192)
    r = np.random.default_rng(3)
    r2 = jnp.array(r.uniform(0, 20, (3, n)), jnp.float32)
    dcost = data_costs(r2, jnp.ones((3,), bool), jnp.ones((n,), bool),
                       0.4, 9.0)
    init = jnp.argmin(dcost, axis=0).astype(jnp.int32)
    l_dense, e_dense = icm_sweeps(dcost, init, dense, 0.4, 4)
    l_band, e_band = icm_sweeps(dcost, init, band, 0.4, 4)
    np.testing.assert_array_equal(np.asarray(l_band), np.asarray(l_dense))
    np.testing.assert_allclose(float(e_band), float(e_dense), rtol=1e-6)


def test_engine_restart_selection_matches_best_energy():
    """fit(n_restarts=R) must return the restart a single-run sweep with
    the same keys would rank lowest by total energy."""
    from progressivex_tpu.core.config import EngineConfig, make_params
    from progressivex_tpu.core.engine import fit

    r = np.random.default_rng(4)
    n = 128
    # two lines + outliers
    t = r.uniform(0, 100, 50)
    a = np.stack([t, 0.5 * t + 3 + r.normal(0, 0.3, 50)], 1)
    b = np.stack([t, -0.8 * t + 60 + r.normal(0, 0.3, 50)], 1)
    o = r.uniform(0, 100, (28, 2))
    data = jnp.array(np.concatenate([a, b, o]).astype(np.float32))
    mask = jnp.ones((n,), bool)
    wts = jnp.ones((n,), jnp.float32)
    params = make_params(threshold=1.0, confidence=0.9, min_inliers=10,
                         spatial_weight=0.2, neighborhood_radius=30.0,
                         n_valid=n)
    base = dict(family="line2d", n_hypotheses=64, max_rounds=4,
                pearl_iters=2, icm_sweeps=2, sampler_id=0)
    key = jax.random.PRNGKey(7)
    from progressivex_tpu.models import get_family

    family = get_family("line2d")
    multi = fit(family, EngineConfig(**base, n_restarts=3), params,
                data, mask, wts, key)
    singles = [
        fit(family, EngineConfig(**base), params, data, mask, wts, k)
        for k in jax.random.split(key, 3)
    ]
    best = min(singles, key=lambda rres: float(rres.energy))
    assert float(multi.energy) == pytest.approx(float(best.energy), rel=1e-5)
    np.testing.assert_array_equal(
        np.asarray(multi.labels), np.asarray(best.labels))


def test_grid_graph_same_cell_semantics():
    """grid_graph (GridNeighborhoodGraph parity, ops/knn.grid_graph):
    neighbors are exactly same-cell points (k-capped, nearest-first),
    self-edges masked, padding masked."""
    from progressivex_tpu.ops.knn import grid_graph

    r = np.random.default_rng(0)
    n, cell = 96, 10.0
    pts = r.uniform(0, 50, (n, 2))
    mask = np.ones(n, bool)
    mask[-8:] = False
    k = 6
    idx, m = grid_graph(jnp.array(pts), jnp.array(mask), cell, k)
    idx, m = np.asarray(idx), np.asarray(m)
    cells = np.floor(pts / cell).astype(int)
    for i in range(n):
        if not mask[i]:
            continue
        nbrs = idx[i][m[i]]
        # Every reported neighbor: valid, not self, same cell.
        assert i not in nbrs
        for j in nbrs:
            assert mask[j]
            assert (cells[j] == cells[i]).all(), (i, j)
        # Degree = min(k, same-cell population - 1).
        pop = sum(1 for j in range(n)
                  if mask[j] and j != i and (cells[j] == cells[i]).all())
        assert m[i].sum() == min(k, pop), (i, pop)
    # Padded rows report no neighbors.
    assert not m[~mask].any()
