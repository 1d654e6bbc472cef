"""Batched multi-scene front ends (api_batch): format parity with the
single-scene API, mixed-size bucketing, restart flattening, per-scene
thresholds for the calibrated path."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from progressivex_tpu import (
    findHomographies,
    findHomographiesBatched,
    findLinesBatched,
    findTwoViewMotionsBatched,
)
from progressivex_tpu.io.data import load_corr_scene
from progressivex_tpu.io.metrics import misclassification


def _synth_homography_scene(n, seed):
    r = np.random.default_rng(seed)
    Hs = [
        np.array([[1.0, 0.0, 40.0], [0.0, 1.0, -10.0], [0.0, 0.0, 1.0]]),
        np.array([[0.9, 0.1, -20.0], [-0.1, 1.1, 30.0], [0.0, 0.0, 1.0]]),
    ]
    per = n // 3
    parts, gt = [], []
    for k, H in enumerate(Hs):
        p1 = r.uniform(0, 200, (per, 2))
        ph = np.concatenate([p1, np.ones((per, 1))], 1) @ H.T
        p2 = ph[:, :2] / ph[:, 2:3] + r.normal(scale=0.5, size=(per, 2))
        parts.append(np.concatenate([p1, p2], 1))
        gt.extend([k + 1] * per)  # GT convention: 0 = outlier
    n_out = n - 2 * per
    parts.append(r.uniform(0, 200, (n_out, 4)))
    gt.extend([0] * n_out)
    return np.concatenate(parts), np.array(gt)


HKW = dict(threshold=3.0, conf=0.9, spatial_coherence_weight=0.0,
           neighborhood_ball_radius=200.0, maximum_tanimoto_similarity=0.4,
           max_iters=128, minimum_point_number=20, maximum_model_number=4,
           sampler_id=0, scoring_exponent=2)


def test_batched_mixed_sizes_quality_and_format():
    """Scenes of different pad levels (150 -> 256, 400 -> 512) in one
    call: both fits find the 2 planted structures at low ME, and each
    element matches the single-scene return format."""
    scenes = [_synth_homography_scene(150, 0), _synth_homography_scene(400, 1)]
    out = findHomographiesBatched([c for c, _ in scenes], **HKW,
                                  random_seed=3)
    assert len(out) == 2
    for (descs, labels), (corrs, gt) in zip(out, scenes):
        assert descs.dtype == np.float64
        assert descs.shape[0] % 3 == 0 and descs.shape[1] == 3
        k = descs.shape[0] // 3
        assert labels.shape == (corrs.shape[0],)
        assert labels.max() <= k  # label k = outliers
        assert 2 <= k <= 3
        me = misclassification(labels, gt)
        assert me <= 0.10, me


def test_batched_matches_single_scene_protocol_quality():
    """On a bundled GT scene the batched path reaches the same quality
    band as the single-scene front end (same protocol; keys differ by
    construction, so exact equality is not required)."""
    corrs, gt = load_corr_scene("oldclassicswing")
    kw = dict(threshold=4.0, conf=0.5, spatial_coherence_weight=0.05,
              neighborhood_ball_radius=200.0,
              maximum_tanimoto_similarity=0.4, max_iters=256,
              minimum_point_number=10, maximum_model_number=6,
              sampler_id=3, scoring_exponent=2)
    single = findHomographies(corrs[:, :4], **kw, random_seed=0)
    batched = findHomographiesBatched([corrs[:, :4]], **kw, random_seed=0)
    me_s = misclassification(single[1], gt)
    me_b = misclassification(batched[0][1], gt)
    assert me_b <= max(2 * me_s, 0.05), (me_b, me_s)
    assert batched[0][0].shape[1] == 3


def test_batched_fundamental_with_restarts():
    """The F path (restarts flattened into the row axis) runs and hits
    its quality gate on a bundled scene."""
    corrs, gt = load_corr_scene("book")
    kw = dict(threshold=0.75, conf=0.5, spatial_coherence_weight=0.5,
              neighborhood_ball_radius=50.0,
              maximum_tanimoto_similarity=0.4, max_iters=512,
              minimum_point_number=7, maximum_model_number=4,
              sampler_id=2, scoring_exponent=1)
    out = findTwoViewMotionsBatched([corrs[:, :4]], **kw, n_restarts=3,
                                    random_seed=0)
    descs, labels = out[0]
    assert descs.shape[0] % 3 == 0
    me = misclassification(labels, gt)
    assert me <= 0.12, me


def test_batched_lines_smoke():
    r = np.random.default_rng(5)
    pts = []
    for a, b in ((0.0, 10.0), (1.0, -5.0)):
        x = r.uniform(0, 100, 60)
        y = a * x + b + r.normal(scale=0.3, size=60)
        pts.append(np.stack([x, y], 1))
    pts.append(r.uniform(-50, 150, (30, 2)))
    scene = np.concatenate(pts)
    out = findLinesBatched([scene, scene[:100]], threshold=1.0, conf=0.9,
                           max_iters=64, minimum_point_number=25,
                           maximum_model_number=4, sampler_id=0)
    assert len(out) == 2
    for descs, labels in out:
        assert descs.shape[1] == 3 and labels.shape[0] in (150, 100)
        assert descs.shape[0] >= 1


def test_batched_essential_per_scene_intrinsics():
    """findEssentialMatricesBatched: two calibrated scenes with DIFFERENT
    intrinsics share one program; per-scene K^-1 normalization and
    threshold/f scaling ride in as per-lane runtime values."""
    from progressivex_tpu import findEssentialMatricesBatched

    def scene(seed, f):
        r = np.random.default_rng(seed)
        ax = np.array([0.2, -0.5, 0.8]); ax /= np.linalg.norm(ax)
        th = 0.3
        Kx = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                       [-ax[1], ax[0], 0]])
        R = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * Kx @ Kx
        t = np.array([1.0, 0.2, -0.1]); t /= np.linalg.norm(t)
        X = r.uniform(-1, 1, (80, 3)) + np.array([0, 0, 4.0])
        x1 = X[:, :2] / X[:, 2:3]
        Xc = X @ R.T + t
        x2 = Xc[:, :2] / Xc[:, 2:3]
        K = np.array([[f, 0, 320.0], [0, f, 240.0], [0, 0, 1.0]])
        p1 = x1 * f + [320, 240]
        p2 = x2 * f + [320, 240]
        corr = np.concatenate([p1, p2], 1)
        corr += r.normal(0, 0.3, corr.shape)
        out = r.uniform(0, 640, (40, 2)), r.uniform(0, 480, (40, 2))
        corr = np.concatenate(
            [corr, np.concatenate([out[0], out[1]], 1)])
        gt = np.array([1] * 80 + [0] * 40)
        return corr, K, gt

    (c1, K1, g1), (c2, K2, g2) = scene(0, 600.0), scene(1, 900.0)
    out = findEssentialMatricesBatched(
        [c1, c2], [K1, K2], [K1, K2], threshold=2.0, conf=0.9,
        spatial_coherence_weight=0.1, neighborhood_ball_radius=200.0,
        max_iters=128, minimum_point_number=20, maximum_model_number=2,
    )
    for (descs, labels), gt in zip(out, (g1, g2)):
        assert descs.shape[0] // 3 >= 1
        me = misclassification(labels, gt)
        assert me <= 0.15, me


def test_batched_poses_tless():
    """find6DPosesBatched on the bundled T-LESS scene hits the same
    reference-anchored gates as the single-scene front end."""
    from progressivex_tpu import find6DPosesBatched
    from progressivex_tpu.io.data import load_tless_scene
    from progressivex_tpu.io.metrics import pose_errors

    xy, xyz, K, gt_poses = load_tless_scene()
    out = find6DPosesBatched(
        [xy], [xyz], K,
        threshold=4.0, conf=0.9, spatial_coherence_weight=0.1,
        neighborhood_ball_radius=20.0, maximum_tanimoto_similarity=0.9,
        max_iters=400, minimum_point_number=6, random_seed=0,
    )
    poses, labeling = out[0]
    k = poses.shape[0] // 3
    assert k >= 2, k
    errs = pose_errors([poses[3 * i:3 * i + 3] for i in range(k)], gt_poses)
    # Same gates as test_pose6d (1.2x the reference anchors, second
    # rotation at 2 deg for seed spread).
    for gi, ((rot, tr), rg, tg) in enumerate(
            zip(errs, (9.9, 2.0), (28.8, 14.64))):
        assert rot <= rg, f"GT pose {gi}: rotation error {rot:.2f} > {rg}"
        assert tr <= tg, f"GT pose {gi}: translation error {tr:.2f} > {tg}"
    assert labeling.shape == (1886,)


def test_batched_input_validation():
    with pytest.raises(ValueError):
        findHomographiesBatched([np.zeros((3, 4))])
    with pytest.raises(ValueError):
        findTwoViewMotionsBatched([np.zeros((10, 3))])


def test_batched_engine_kwargs_pass_through():
    """Every batched front end forwards the engine-extension kwargs the
    single-scene front ends take (round-5 parity fix: findLinesBatched
    rejected max_rounds=). A tiny two-line scene under a reduced
    max_rounds must still fit; a bogus kwarg must raise TypeError."""
    from progressivex_tpu import findLinesBatched

    r = np.random.default_rng(0)
    pts = np.concatenate([
        np.stack([np.linspace(0, 100, 40),
                  np.linspace(0, 100, 40) + r.normal(0, .5, 40)], 1),
        np.stack([np.linspace(0, 100, 40),
                  50 - 0.3 * np.linspace(0, 100, 40)
                  + r.normal(0, .5, 40)], 1),
        r.uniform(0, 100, (20, 2)),
    ])
    kw = dict(threshold=1.5, conf=0.5, minimum_point_number=20,
              maximum_model_number=4, max_iters=128, sampler_id=0)
    out = findLinesBatched([pts], **kw, max_rounds=4, pearl_iters=2,
                           random_seed=0)
    assert out[0][0].shape[0] >= 1
    with pytest.raises(TypeError):
        findLinesBatched([pts], **kw, not_a_kwarg=1)
