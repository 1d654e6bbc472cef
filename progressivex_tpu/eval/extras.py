"""Extra bench phases: 2D lines, vanishing points, essential gauntlet.

VERDICT r4 item 3: bench.py measured H / F / T-LESS only, leaving the
other half of the capability surface (lines, VPs, the essential-matrix
extension) without driver-visible perf/quality numbers. These phases
mirror the reference's remaining example workloads:

- lines: `examples/example_multi_lines.ipynb` cell 6 — 3180 Canny edge
  points -> 7 lines in 0.709 s on the reference CPU (BASELINE.md). Here
  the same cardinality as a synthetic wireframe with known GT labels, so
  the phase reports ME as well (the notebook has no GT).
- vanishing points: `example_multi_vanishing_point.ipynb` cells 4-5 —
  filtered LSD segments -> 3 VPs with 80/57/39 inliers in 0.0048 s. Here
  the same inlier structure synthesized around 3 known VPs + clutter.
- essential gauntlet: the reference ships five-point solver headers but
  no essential front end (progressive_x.h:19,24); findEssentialMatrices
  is this package's extension and the 2-motion gauntlet (shared with
  tests/test_gauntlet.py) is its quality evidence. No reference anchor
  exists; the phase reports mean ME + per-seed values + latency.

Scene generators live here so the bench and the gauntlet tests exercise
the SAME scene distribution (tests/test_gauntlet.py imports them).

Timing protocol: one warmup call compiles (persistent-cache-served when
the checkout ships `.jax_cache/`), then best-of-`n_runs` wall time of a
single public-API call — latency, the quantity the reference notebooks
report, not saturated-batch throughput.
"""

from __future__ import annotations

import time

import numpy as np


# ---------------------------------------------------------------------------
# Scene generators (deterministic; shared with tests/test_gauntlet.py).

def make_lines_scene(n_lines=7, per_line=400, n_outliers=380, seed=0):
    """K noisy line segments' worth of edge points + uniform clutter.
    Defaults give N = 3180 points, the reference notebook's cardinality.
    Returns (points [N, 2], gt_labels [N]) with outliers labeled 0."""
    r = np.random.default_rng(int(seed))
    pts, gt = [], []
    for li in range(int(n_lines)):
        p0 = r.uniform(0, 500, 2)
        ang = r.uniform(0, np.pi)
        d = np.array([np.cos(ang), np.sin(ang)])
        t = r.uniform(0, 400, int(per_line))
        p = p0 + t[:, None] * d + r.normal(scale=0.7,
                                           size=(int(per_line), 2))
        pts.append(p)
        gt += [li + 1] * int(per_line)
    pts.append(r.uniform(0, 600, (int(n_outliers), 2)))
    gt += [0] * int(n_outliers)
    data = np.concatenate(pts)
    perm = r.permutation(len(data))
    return data[perm], np.array(gt)[perm]


def make_vp_scene(seed=0, counts=(80, 57, 39), n_outliers=40, img=640.0):
    """Line segments supported by 3 vanishing points + random clutter —
    the reference VP notebook's inlier structure (80/57/39 segments).
    Returns (segments [N, 4], gt_labels [N], vps [3, 2])."""
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


def make_multi_motion_scene(n_motions=3, pts_per=100, outlier_frac=0.55,
                            seed=0, f=800.0):
    """K rigid motions seen by two views: each object's 3D points move by
    a distinct (R, t), giving K epipolar structures + outliers.
    Returns (corrs [N, 4], gt_labels [N]) with outliers labeled 0."""
    r = np.random.default_rng(seed)

    def rot(axis, ang):
        axis = axis / np.linalg.norm(axis)
        K = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                      [-axis[1], axis[0], 0]])
        return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * K @ K

    Kc = np.array([[f, 0, 320.0], [0, f, 240.0], [0, 0, 1.0]])
    corrs, labels = [], []
    for k in range(n_motions):
        X = r.uniform(-1, 1, (pts_per, 3)) * [1.5, 1.0, 0.4]
        X[:, 2] += 6.0 + 2.0 * k
        X[:, 0] += 2.0 * (k - n_motions / 2)
        R = rot(r.normal(size=3), r.uniform(0.1, 0.35))
        t = r.uniform(-0.5, 0.5, 3) * [1, 1, 0.3]
        X2 = X @ R.T + t
        x1 = (X @ Kc.T)
        x1 = x1[:, :2] / x1[:, 2:3]
        x2 = (X2 @ Kc.T)
        x2 = x2[:, :2] / x2[:, 2:3]
        noise = r.normal(scale=0.5, size=(pts_per, 4))
        corrs.append(np.concatenate([x1, x2], 1) + noise)
        labels.append(np.full(pts_per, k + 1))
    n_in = n_motions * pts_per
    n_out = int(outlier_frac / (1.0 - outlier_frac) * n_in)
    out = np.concatenate([r.uniform(0, 640, (n_out, 2)),
                          r.uniform(0, 480, (n_out, 2))], 1)
    corrs.append(out)
    labels.append(np.zeros(n_out))
    perm = r.permutation(n_in + n_out)
    return (np.concatenate(corrs)[perm].astype(np.float64),
            np.concatenate(labels)[perm].astype(np.int32))


# ---------------------------------------------------------------------------
# Bench phases. Each returns a flat dict of JSON-ready fields.

def bench_lines(n_runs: int = 3, seed: int = 0, n_batch: int = 32) -> dict:
    """7-line / 3180-point scene latency + batched throughput + quality.

    Reference anchor: `example_multi_lines.ipynb` cell 6 — 0.709 s for
    7 models (no GT in the notebook, so no reference ME). Two timings:
    `lines_time_s` is one public-API call (host round-trips included —
    on a tunneled TPU the dispatch latency dominates small programs), and
    `lines_scenes_per_sec` is the TPU-native number: `n_batch` distinct
    scenes as lanes of one vmapped device program (findLinesBatched)."""
    from progressivex_tpu import findLines, findLinesBatched
    from progressivex_tpu.io.metrics import misclassification

    pts, gt = make_lines_scene(seed=seed)
    # minimum_point_number=30 / conf=0.9, NOT the demo's 50 / 0.5: with
    # min=50 the reference's own unseen-inlier termination rule
    # (progressive_x.h:495-513) fires marginally after ~6 of the 7 lines
    # (measured round 5: unseen estimate ~45 < 50 ends the search;
    # 32-scene A/B: min50 ME 0.152 / 5.9 models, min30+conf0.9 ME 0.105 /
    # 6.8 models at 64 vs 56 scenes/s). The anchor workload's lines carry
    # 400 points each, so 30 is a safely conservative support floor.
    kw = dict(threshold=2.0, conf=0.9, minimum_point_number=30,
              sampler_id=0, maximum_model_number=12)
    findLines(pts, **kw, random_seed=seed)  # warm/compile
    best, k, me = float("inf"), 0, float("nan")
    for i in range(n_runs):
        t0 = time.perf_counter()
        lines, labeling = findLines(pts, **kw, random_seed=seed + i)
        dt = time.perf_counter() - t0
        if dt < best:
            best, k, me = dt, int(lines.shape[0]), float(
                misclassification(labeling, gt))
    out = {
        "lines_time_s": round(best, 4),
        "lines_ref_time_s": 0.709,
        "lines_n_models": k,
        "lines_ref_n_models": 7,
        "lines_me": round(me, 4),
        "lines_n_points": int(pts.shape[0]),
    }
    # On-chip device time via the profiler-backed Statistics (the wall
    # latency above is dispatch-dominated on a tunneled chip: measured
    # 3.2 ms device vs ~360 ms wall).
    _, _, st = findLines(pts, **kw, with_statistics="phases",
                         random_seed=seed)
    if st.phase_times:
        out["lines_device_ms"] = st.phase_times["total_device_ms"]
    scenes = [make_lines_scene(seed=seed + i) for i in range(n_batch)]
    pts_list = [s[0] for s in scenes]
    findLinesBatched(pts_list, **kw, random_seed=seed)  # warm/compile
    t0 = time.perf_counter()
    res = findLinesBatched(pts_list, **kw, random_seed=seed + 1)
    dt = time.perf_counter() - t0
    mes = [misclassification(lab, scenes[i][1])
           for i, (_, lab) in enumerate(res)]
    out.update({
        "lines_scenes_per_sec": round(n_batch / dt, 2),
        "lines_batched_me": round(float(np.mean(mes)), 4),
        "lines_n_batch": n_batch,
    })
    return out


def bench_vps(n_runs: int = 3, seed: int = 0) -> dict:
    """3-VP / 216-segment scene latency + quality.

    Reference anchor: `example_multi_vanishing_point.ipynb` cells 4-5 —
    0.0048 s for 3 VPs on 216 filtered LSD segments."""
    from progressivex_tpu import findVanishingPoints
    from progressivex_tpu.io.metrics import misclassification

    segs, gt, _ = make_vp_scene(seed=seed)
    kw = dict(threshold=1.5, conf=0.5, spatial_coherence_weight=0.0,
              neighborhood_ball_radius=200.0,
              maximum_tanimoto_similarity=0.4, max_iters=1000,
              minimum_point_number=15, maximum_model_number=5,
              sampler_id=0, scoring_exponent=2)
    findVanishingPoints(segs, **kw, random_seed=seed)  # warm/compile
    best, k, me = float("inf"), 0, float("nan")
    for i in range(n_runs):
        t0 = time.perf_counter()
        vps, labeling = findVanishingPoints(segs, **kw,
                                            random_seed=seed + i)
        dt = time.perf_counter() - t0
        if dt < best:
            best, k, me = dt, int(vps.shape[0]), float(
                misclassification(labeling, gt))
    out = {
        "vp_time_s": round(best, 4),
        "vp_ref_time_s": 0.0048,
        "vp_n_models": k,
        "vp_ref_n_models": 3,
        "vp_me": round(me, 4),
        "vp_n_segments": int(segs.shape[0]),
    }
    # On-chip device time (wall latency is dispatch-dominated on a
    # tunneled chip — see bench_lines).
    _, _, st = findVanishingPoints(segs, **kw, with_statistics="phases",
                                   random_seed=seed)
    if st.phase_times:
        out["vp_device_ms"] = st.phase_times["total_device_ms"]
    # Batched throughput (the TPU-native number — one tiny scene's call
    # latency is dispatch-bound on a tunneled chip): n_batch distinct
    # scenes as lanes of one vmapped program. 256 lanes measured 521.9
    # scenes/s on the v5e vs 166 at 64 lanes (tiny scenes need the wide
    # batch to saturate) — 2.5x the reference's sequential-equivalent
    # rate (1 / 0.0048 s = 208 scenes/s).
    from progressivex_tpu import findVanishingPointsBatched

    n_batch = 256
    scenes = [make_vp_scene(seed=seed + i) for i in range(n_batch)]
    segs_list = [s[0] for s in scenes]
    bkw = dict(kw)
    bkw["sampler_id"] = 0
    findVanishingPointsBatched(segs_list, **bkw, random_seed=seed)  # warm
    t0 = time.perf_counter()
    res = findVanishingPointsBatched(segs_list, **bkw,
                                     random_seed=seed + 1)
    dt = time.perf_counter() - t0
    mes = [misclassification(lab, scenes[i][1])
           for i, (_, lab) in enumerate(res)]
    out.update({
        "vp_scenes_per_sec": round(n_batch / dt, 2),
        "vp_batched_me": round(float(np.mean(mes)), 4),
        "vp_n_batch": n_batch,
    })
    return out


def bench_essential(seeds=(0, 1, 2), n_time_runs: int = 2) -> dict:
    """Two-motion essential gauntlet (tests/test_gauntlet.py's scenes).

    The reference has no essential front end, so there is no anchor; the
    gate history (test_gauntlet) measured per-seed MEs 0.0275 / 0.0200 /
    0.0450 with the split pass. All seeds share one compiled program
    (identical N), so only the first call pays compile."""
    from progressivex_tpu import findEssentialMatrices
    from progressivex_tpu.io.metrics import misclassification

    f = 800.0
    K = np.array([[f, 0, 320.0], [0, f, 240.0], [0, 0, 1.0]])
    kw = dict(threshold=1.5, conf=0.5, spatial_coherence_weight=0.2,
              neighborhood_ball_radius=60.0,
              maximum_tanimoto_similarity=0.4, max_iters=1000,
              minimum_point_number=25, maximum_model_number=6,
              sampler_id=0, scoring_exponent=2, n_restarts=3)
    mes, ks = [], []
    best = float("inf")
    for i, seed in enumerate(seeds):
        corrs, gt = make_multi_motion_scene(
            n_motions=2, pts_per=100, outlier_frac=0.5, seed=seed, f=f)
        E, lab = findEssentialMatrices(corrs, K, K, **kw,
                                       random_seed=seed)  # warm on i==0
        mes.append(float(misclassification(lab, gt)))
        ks.append(int(E.shape[0]) // 3)
        if i == 0:
            for _ in range(n_time_runs):
                t0 = time.perf_counter()
                findEssentialMatrices(corrs, K, K, **kw, random_seed=seed)
                best = min(best, time.perf_counter() - t0)
    return {
        "essential_gauntlet_me": round(float(np.mean(mes)), 4),
        "essential_gauntlet_me_per_seed": [round(m, 4) for m in mes],
        "essential_gauntlet_n_models": ks,
        "essential_time_s": round(best, 4),
    }
