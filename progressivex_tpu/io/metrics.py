"""Evaluation metrics.

Misclassification follows the reference notebook metric
(`/root/reference/dataset_comparison/utils.py:51-66`): the fraction of
points whose predicted label disagrees with the ground truth under the best
one-to-one relabeling of the GT classes. The reference brute-forces all
permutations (and the C++ variant caps K <= 9, `progx_utils.h:105-108`);
here the optimal matching is found by the Hungarian algorithm, which is
exact and has no class-count cap.

Pose errors follow `cpp_example.cpp:441-455`: rotation error in degrees via
the trace formula, translation error as the Euclidean distance.
"""

from __future__ import annotations

import numpy as np


def _assignment_max(M: "np.ndarray") -> int:
    """Maximal assignment sum of a square int64 matrix: the native
    Hungarian implementation (progx_native, native/progx_native.cpp) when
    built, else scipy's linear_sum_assignment."""
    try:
        import progx_native

        return int(progx_native.hungarian_max(
            np.ascontiguousarray(M, np.int64).tobytes(), M.shape[0]
        ))
    except ImportError:
        from scipy.optimize import linear_sum_assignment

        ri, ci = linear_sum_assignment(-M)
        return int(M[ri, ci].sum())


def misclassification(pred_labels, gt_labels) -> float:
    """Fraction misclassified under the best GT-class relabeling."""
    pred = np.asarray(pred_labels).astype(np.int64)
    gt = np.asarray(gt_labels).astype(np.int64)
    n = int(gt.max()) + 1
    # M[i, j] = points with GT class i predicted as label j (j in 0..n-1;
    # predicted labels >= n can never match, exactly as in the reference).
    M = np.zeros((n, n), dtype=np.int64)
    in_range = pred < n
    np.add.at(M, (gt[in_range], pred[in_range]), 1)
    matched = _assignment_max(M)
    return 1.0 - matched / len(pred)


def rotation_error_deg(R_est, R_gt) -> float:
    """Angular distance between two rotations, in degrees."""
    cos = (np.trace(R_est @ R_gt.T) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(cos, -1.0, 1.0))))


def translation_error(t_est, t_gt) -> float:
    return float(np.linalg.norm(np.asarray(t_est) - np.asarray(t_gt)))


def pose_errors(poses_est, poses_gt):
    """Best-matching (rotation, translation) errors for each GT pose.

    Returns a list of (rot_deg, transl) — one entry per GT pose, using the
    estimated pose with the smallest rotation error (the reference demo
    reports per-GT-pose best errors, cpp_example.cpp:406-438)."""
    out = []
    for Pg in poses_gt:
        best = (np.inf, np.inf)
        for Pe in poses_est:
            r = rotation_error_deg(Pe[:, :3], Pg[:, :3])
            t = translation_error(Pe[:, 3], Pg[:, 3])
            if r < best[0]:
                best = (r, t)
        out.append(best)
    return out
