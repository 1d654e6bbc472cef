"""Statistics.phase_times (profiler-backed per-phase device time) and the
eval.extras bench-phase scene generators."""

import numpy as np
import pytest

from progressivex_tpu.eval.extras import (
    make_lines_scene,
    make_multi_motion_scene,
    make_vp_scene,
)


def test_extras_generators_shapes_and_determinism():
    pts, gt = make_lines_scene(seed=3)
    assert pts.shape == (3180, 2) and gt.shape == (3180,)
    assert set(np.unique(gt)) == set(range(8))  # 0 (outliers) + 7 lines
    pts2, gt2 = make_lines_scene(seed=3)
    np.testing.assert_array_equal(pts, pts2)
    np.testing.assert_array_equal(gt, gt2)

    segs, gt, vps = make_vp_scene(seed=1)
    assert segs.shape == (216, 4) and vps.shape == (3, 2)
    assert [int((gt == i).sum()) for i in (1, 2, 3)] == [80, 57, 39]

    corrs, gt = make_multi_motion_scene(n_motions=2, pts_per=50,
                                        outlier_frac=0.5, seed=0)
    assert corrs.shape == (200, 4)
    assert int((gt == 0).sum()) == 100


@pytest.mark.slow
def test_phase_times_populated():
    """with_statistics="phases" profiles one run and rolls device time up
    by engine phase tag; plain True leaves phase_times None."""
    from progressivex_tpu import findLines

    r = np.random.default_rng(0)
    pts = np.concatenate([
        np.stack([np.linspace(0, 100, 40),
                  np.linspace(0, 100, 40) + r.normal(0, .5, 40)], 1),
        r.uniform(0, 100, (30, 2)),
    ])
    kw = dict(threshold=1.5, conf=0.5, minimum_point_number=15,
              maximum_model_number=4, max_iters=200, sampler_id=0,
              random_seed=0)
    _, _, stats = findLines(pts, **kw, with_statistics=True)
    assert stats.phase_times is None

    _, _, stats = findLines(pts, **kw, with_statistics="phases")
    pt = stats.phase_times
    if pt is None:
        pytest.skip("backend produced no profiler trace")
    for key in ("progx_proposal_ms", "progx_labeling_ms",
                "progx_refit_ms", "other_ms", "total_device_ms"):
        assert key in pt
    assert pt["total_device_ms"] > 0.0
    parts = sum(v for k, v in pt.items() if k != "total_device_ms")
    assert parts == pytest.approx(pt["total_device_ms"], rel=0.02)
