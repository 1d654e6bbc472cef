"""Unit tests for api._fuse_pose_duplicates (host-side, no engine run).

ADVICE r4: the original union-find grouping chained transitively — poses
A and C each within the gates of B but ~2x the rotation gate apart could
fuse into one group whose chordal mean represents neither. The greedy
grouping gates every candidate against the running fused mean of the
group it would join, so no member can end up outside the gates of the
final pose.
"""

import numpy as np

from progressivex_tpu.api import _fuse_pose_duplicates


def _rot_z(deg):
    c, s = np.cos(np.deg2rad(deg)), np.sin(np.deg2rad(deg))
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _scene(Rs, ts, n_per=40, noise=0.0, seed=0):
    """Points/labels so every instance has equal support and perfect
    tight-inlier density under its own pose."""
    r = np.random.default_rng(seed)
    xyz, norm_xy, labels = [], [], []
    for i, (R, t) in enumerate(zip(Rs, ts)):
        X = r.uniform(-0.5, 0.5, (n_per, 3))
        Xc = X @ R.T + t
        xy = Xc[:, :2] / Xc[:, 2:3]
        xyz.append(X)
        norm_xy.append(xy + noise)
        labels += [i] * n_per
    descs = np.stack([np.concatenate([R, t[:, None]], 1).reshape(12)
                      for R, t in zip(Rs, ts)])
    return (descs, np.array(labels), np.concatenate(norm_xy),
            np.concatenate(xyz))


def test_duplicates_fuse_to_one():
    Rs = [_rot_z(0.0), _rot_z(8.0)]
    ts = [np.array([0.0, 0.0, 4.0]), np.array([0.0, 0.01, 4.0])]
    descs, labels, norm_xy, xyz = _scene(Rs, ts)
    d2, l2 = _fuse_pose_duplicates(descs, labels, norm_xy, xyz, 0.01)
    assert d2.shape[0] == 1
    # Chordal mean of equal-support 0 and 8 deg is ~4 deg.
    Rf = d2[0].reshape(3, 4)[:, :3]
    ang = np.rad2deg(np.arccos(np.clip(
        0.5 * (np.trace(_rot_z(4.0).T @ Rf) - 1.0), -1, 1)))
    assert ang < 1.0
    # All members renumbered to instance 0, outlier label = 1.
    assert set(np.unique(l2)) == {0}


def test_distinct_poses_stay_separate():
    Rs = [_rot_z(0.0), _rot_z(90.0)]
    ts = [np.array([0.0, 0.0, 4.0]), np.array([1.0, 0.0, 4.0])]
    descs, labels, norm_xy, xyz = _scene(Rs, ts)
    d2, l2 = _fuse_pose_duplicates(descs, labels, norm_xy, xyz, 0.01)
    assert d2.shape[0] == 2
    assert set(np.unique(l2)) == {0, 1}


def test_no_transitive_chaining():
    """A at -25 deg, B at 0, C at +25 deg (gate 30): A-B and B-C are each
    within the gate, A-C is not. Union-find fused all three; the greedy
    grouping must not put A and C in one group. With B's support largest,
    B seeds the group, one neighbor joins (mean moves ~12 deg toward it),
    and the other lands outside the 30-deg gate of the moved mean."""
    Rs = [_rot_z(-25.0), _rot_z(0.0), _rot_z(25.0)]
    t = np.array([0.0, 0.0, 4.0])
    ts = [t, t, t]
    descs, labels, norm_xy, xyz = _scene(Rs, ts, n_per=40)
    # Make B the largest support so it seeds its group first.
    labels = np.concatenate([[0] * 30, [1] * 10,
                             [1] * 40, [2] * 30, [0] * 10])
    d2, _ = _fuse_pose_duplicates(descs, labels, norm_xy, xyz, 0.01)
    assert d2.shape[0] == 2, "chained A-B-C fusion must not collapse to 1"
    # Every returned pose must be within the rotation gate of every
    # member that fused into it — the invariant union-find violated.
    angles = sorted(
        np.rad2deg(np.arccos(np.clip(
            0.5 * (np.trace(d2[i].reshape(3, 4)[:, :3]) - 1.0), -1, 1)))
        for i in range(2))
    assert angles[0] <= 30.0 and angles[1] <= 30.0
