"""Native runtime extension (progx_native) parity tests. Skipped when the
extension isn't built — the Python fallbacks cover functionality; these
tests pin exact agreement between the two paths."""

import numpy as np
import pytest

progx_native = pytest.importorskip("progx_native")

from progressivex_tpu.io.data import DEFAULT_ROOT, load_corr_scene  # noqa: E402


def test_native_loader_matches_numpy():
    import os
    if not os.path.isdir(DEFAULT_ROOT):
        pytest.skip("bundled scenes unavailable")
    for scene in ("oldclassicswing", "book"):
        cb, lb = progx_native.load_corr_scene(
            f"{DEFAULT_ROOT}/{scene}/{scene}.txt")
        corrs_n = np.frombuffer(cb, np.float32).reshape(-1, 4)
        labels_n = np.frombuffer(lb, np.int32)
        M = np.loadtxt(f"{DEFAULT_ROOT}/{scene}/{scene}.txt")
        np.testing.assert_allclose(
            corrs_n, np.concatenate([M[:, :2], M[:, 3:5]], 1), atol=1e-4)
        np.testing.assert_array_equal(labels_n, M[:, -1].astype(np.int32))


def test_native_hungarian_matches_scipy():
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(1)
    for _ in range(30):
        n = int(rng.integers(2, 12))
        A = rng.integers(0, 1000, (n, n)).astype(np.int64)
        ri, ci = linear_sum_assignment(-A)
        want = int(A[ri, ci].sum())
        got = int(progx_native.hungarian_max(A.tobytes(), n))
        assert want == got
