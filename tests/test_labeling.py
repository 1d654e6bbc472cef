"""Labeling-solver tests: data-cost parity with the reference energy
(`PEARL.h:82-128`), ICM energy monotonicity, and exact w=0 behavior."""

import numpy as np
import jax.numpy as jnp

from progressivex_tpu.ops.labeling import (
    adjacency_from_knn,
    data_costs,
    icm_sweeps,
    labeling_energy,
)


def _random_problem(seed, n=60, k=3, knn=4):
    r = np.random.default_rng(seed)
    r2 = r.uniform(0, 10, size=(k, n))
    active = np.array([True] * k)
    mask = np.ones(n, bool)
    idx = np.stack([r.permutation(n)[:knn] for _ in range(n)])
    knn_mask = np.ones((n, knn), bool)
    adj = adjacency_from_knn(jnp.array(idx), jnp.array(knn_mask))
    return jnp.array(r2), jnp.array(active), jnp.array(mask), adj


def test_data_costs_reference_values():
    w = 0.3
    trunc = 4.0
    r2 = jnp.array([[0.0, 2.0, 4.1, 100.0]])
    active = jnp.array([True])
    mask = jnp.array([True, True, True, True])
    c = np.asarray(data_costs(r2, active, mask, w, trunc))  # [L, N]
    one_minus_w = 0.7
    # model label: (1-w)*r2/trunc below threshold, 2(1-w) above
    np.testing.assert_allclose(
        c[0], [0.0, one_minus_w * 0.5, 2 * one_minus_w, 2 * one_minus_w],
        rtol=1e-6,
    )
    # outlier label: (1-w)
    np.testing.assert_allclose(c[1], one_minus_w)


def test_data_costs_padding_pins_outlier():
    r2 = jnp.zeros((2, 3))
    active = jnp.array([True, True])
    mask = jnp.array([True, False, True])
    c = np.asarray(data_costs(r2, active, mask, 0.2, 4.0))  # [L, N]
    assert c[2, 1] == 0.0 and c[0, 1] > 1e17  # padded point -> outlier only


def test_icm_monotone_energy():
    r2, active, mask, adj = _random_problem(1)
    w = 0.4
    dcost = data_costs(r2, active, mask, w, 4.0)
    labels0 = jnp.full((r2.shape[1],), r2.shape[0], jnp.int32)  # all outlier
    e0 = labeling_energy(dcost, labels0, adj, w)
    labels1, e1 = icm_sweeps(dcost, labels0, adj, w, 1)
    labels8, e8 = icm_sweeps(dcost, labels0, adj, w, 8)
    assert float(e1) <= float(e0) + 1e-5
    assert float(e8) <= float(e1) + 1e-5


def test_icm_w0_is_data_argmin():
    r2, active, mask, adj = _random_problem(2)
    dcost = data_costs(r2, active, mask, 0.0, 4.0)
    labels0 = jnp.full((r2.shape[1],), r2.shape[0], jnp.int32)
    labels, _ = icm_sweeps(dcost, labels0, adj, 0.0, 1)
    want = np.argmin(np.asarray(dcost), axis=0)
    np.testing.assert_array_equal(np.asarray(labels), want)


def test_inactive_slots_never_selected():
    r2, _, mask, adj = _random_problem(3)
    active = jnp.array([True, False, True])
    dcost = data_costs(r2, active, mask, 0.0, 4.0)
    labels0 = jnp.full((r2.shape[1],), 3, jnp.int32)
    labels, _ = icm_sweeps(dcost, labels0, adj, 0.0, 4)
    assert not np.any(np.asarray(labels) == 1)


def test_split_sample_indices_distinct():
    """split_instances' deterministic half-sampling must put m DISTINCT
    points in every minimal sample whenever the half holds >= m points.
    The round-3 co-prime stride (i*7 + j*13 mod npart) degenerated to
    duplicated in-sample points for halves of size 13/26/39/52 (ADVICE
    r3); the fixed stride i*7 + floor(j*npart/m) is collision-free for
    all npart >= m."""
    from progressivex_tpu.core.pearl import _SPLIT_SAMPLES

    for m in (2, 3, 4, 5, 6, 7):  # family sample sizes in the registry
        for npart in (m, m + 1, 13, 26, 39, 52, 64, 65, 100):
            if npart < m:
                continue
            s_ix = (np.arange(_SPLIT_SAMPLES)[:, None] * 7
                    + (np.arange(m)[None, :] * npart) // m) % npart
            for row in s_ix:
                assert len(set(row.tolist())) == m, (m, npart, row)
