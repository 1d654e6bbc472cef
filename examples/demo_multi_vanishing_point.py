"""Multi vanishing-point demo on synthetic LSD-style line segments — the
script equivalent of the reference's
`examples/example_multi_vanishing_point.ipynb` (filtered LSD segments -> 3
VPs with 80/57/39 inliers; reference runtime 0.0048 s — BASELINE.md).

The synthetic scene mirrors that structure: three vanishing points of a
Manhattan-ish frame, each supported by a few dozen segments whose
midpoint-to-VP lines carry small endpoint noise, plus random clutter."""

import os
import sys
import time

import numpy as np

try:
    import progressivex_tpu  # noqa: F401 — installed package
except ImportError:  # clean checkout without `pip install -e .`
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


from progressivex_tpu import findVanishingPoints


def make_scene(seed=0, counts=(80, 57, 39), n_outliers=40, img=640.0):
    r = np.random.default_rng(seed)
    vps = np.array([
        [5000.0, 240.0],   # near-horizontal pencil (VP far right)
        [320.0, -4000.0],  # near-vertical pencil (VP far above)
        [-1500.0, 2500.0],
    ])
    segs, gt = [], []
    for vi, (vp, cnt) in enumerate(zip(vps, counts)):
        mids = r.uniform(40, img - 40, (cnt, 2))
        d = vp[None, :] - mids
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        half = r.uniform(15, 45, (cnt, 1))
        a = mids - d * half + r.normal(0, 0.4, (cnt, 2))
        b = mids + d * half + r.normal(0, 0.4, (cnt, 2))
        segs.append(np.concatenate([a, b], axis=1))
        gt += [vi + 1] * cnt
    mids = r.uniform(0, img, (n_outliers, 2))
    ang = r.uniform(0, np.pi, n_outliers)
    d = np.stack([np.cos(ang), np.sin(ang)], 1)
    half = r.uniform(15, 45, (n_outliers, 1))
    segs.append(np.concatenate([mids - d * half, mids + d * half], axis=1))
    gt += [0] * n_outliers
    return np.concatenate(segs), np.array(gt), vps


def main():
    lines, gt, vps_gt = make_scene()
    t0 = time.perf_counter()
    vps, labeling = findVanishingPoints(
        lines,
        threshold=1.5, conf=0.5, spatial_coherence_weight=0.0,
        neighborhood_ball_radius=200.0, maximum_tanimoto_similarity=0.4,
        max_iters=1000, minimum_point_number=15, maximum_model_number=5,
        sampler_id=0, scoring_exponent=2,
    )
    dt = time.perf_counter() - t0
    k = vps.shape[0]
    print(f"{len(lines)} segments -> {k} vanishing points in {dt:.3f}s")
    for i in range(k):
        v = vps[i]
        inl = int((labeling == i).sum())
        pos = (v[:2] / v[2]) if abs(v[2]) > 1e-9 else v[:2] * np.inf
        print(f"  VP {i}: ({pos[0]:8.1f}, {pos[1]:8.1f})  {inl} segments")


if __name__ == "__main__":
    main()
