"""Live per-round observability (the reference's ProgressVisualizer hook,
progressive_x.h:476-480, redesigned as a host callback out of the fused
program)."""

import numpy as np

from progressivex_tpu import findLines


def _scene(n=128, seed=0):
    r = np.random.default_rng(seed)
    t = r.uniform(0, 100, n // 2)
    l1 = np.stack([t, 0.5 * t + 5], 1)
    t2 = r.uniform(0, 100, n - n // 2)
    l2 = np.stack([t2, -0.3 * t2 + 60.0], 1)
    return np.concatenate([l1, l2]) + r.normal(scale=0.2, size=(n, 2))


def test_progress_callback_fires_per_round():
    events = []
    pts = _scene()
    descs, labels = findLines(
        pts, threshold=1.0, conf=0.95, minimum_point_number=20,
        max_iters=128, random_seed=0, progress_callback=events.append,
    )
    assert len(events) >= 1
    rounds_seen = [e["round"] for e in events]
    assert rounds_seen == sorted(rounds_seen)
    for e in events:
        assert set(e) == {"round", "accepted", "inliers", "tanimoto",
                          "score", "energy", "n_active", "labels"}
        assert e["labels"].shape[0] >= pts.shape[0]
    # The final event's live instance count matches the returned models.
    assert events[-1]["n_active"] == descs.shape[0]
    # The callback must be cleared after the call (module-global slot).
    from progressivex_tpu.core import engine

    assert engine.LIVE_CALLBACK is None


def test_no_callback_no_overhead_path():
    """Without a callback the compiled program must not embed the
    trampoline (cfg.live_progress False -> separate cache entry)."""
    pts = _scene(seed=1)
    events = []
    findLines(pts, threshold=1.0, conf=0.95, minimum_point_number=20,
              max_iters=128, random_seed=0)
    assert events == []
