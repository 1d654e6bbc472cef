"""Loaders for the bundled ground-truth scenes.

Formats (reference `progx_utils.h:32-96` and the notebook loader
`dataset_comparison/utils.py:15-27`):
  * labeled correspondence scenes: rows `x1 y1 1 x2 y2 1 label`
    (homogeneous columns 2 and 5 dropped),
  * T-LESS pose scenes: `tless.txt` rows `x y X Y Z`, `tless_intrinsics.txt`
    a 3x3 K, `tless_poses.txt` one 3x4 [R|t] flattened per row.

Scenes ship with the reference checkout under /root/reference/build/data;
pass `root=` to point at a different AdelaideRMF download.
"""

from __future__ import annotations

import os

import numpy as np


def _resolve_default_root() -> str:
    """Data-root resolution order:

    1. `PROGX_DATA_ROOT` environment variable (explicit override),
    2. the `data/` directory vendored at the repository root (the 7
       ground-truth scenes ship with this package, so tests/demos/bench
       run self-contained),
    3. the reference checkout's bundled data (developer convenience).

    A clear error is raised at load time when none of these exists.
    """
    env = os.environ.get("PROGX_DATA_ROOT")
    if env:
        return env
    vendored = os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(__file__))), "data"
    )
    if os.path.isdir(vendored):
        return vendored
    return "/root/reference/build/data"


DEFAULT_ROOT = _resolve_default_root()

ADELAIDE_H_SCENES = ("oldclassicswing", "unihouse", "unionhouse")
ADELAIDE_F_SCENES = ("book", "breadcube", "cubetoy")


def load_corr_scene(name: str, root: str = DEFAULT_ROOT):
    """Load a labeled correspondence scene -> (corrs [N,4], labels [N]).

    Uses the native parser (progx_native, native/progx_native.cpp — the
    counterpart of the reference's C++ loader `progx_utils.h:32-96`) when
    the extension is built, else a NumPy fallback."""
    path = os.path.join(root, name, f"{name}.txt")
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"scene file {path!r} not found — set PROGX_DATA_ROOT to a "
            "directory holding <scene>/<scene>.txt ground-truth files "
            "(the repository ships the 7 bundled scenes under data/)"
        )
    try:
        import progx_native

        cb, lb = progx_native.load_corr_scene(path)
        corrs = np.frombuffer(cb, np.float32).reshape(-1, 4).astype(np.float64)
        labels = np.frombuffer(lb, np.int32).copy()
        return corrs, labels
    except ImportError:
        pass
    M = np.loadtxt(path)
    corrs = np.concatenate([M[:, :2], M[:, 3:5]], axis=1)
    labels = M[:, -1].astype(np.int32)
    return corrs, labels


def load_tless_scene(root: str = DEFAULT_ROOT):
    """Load the T-LESS 6D-pose scene -> (xy [N,2], xyz [N,3], K [3,3],
    poses [P,3,4]).

    `tless.txt` and `tless_poses.txt` begin with a count-header line (the
    reference loader reads the count first, `progx_utils.h:32-96`), so the
    first row is skipped and checked against the parsed row count."""
    d = os.path.join(root, "tless")
    with open(os.path.join(d, "tless.txt")) as f:
        n = int(f.readline().split()[0])
        pts = np.loadtxt(f)
    assert pts.shape == (n, 5), f"tless.txt: expected {n}x5, got {pts.shape}"
    K = np.loadtxt(os.path.join(d, "tless_intrinsics.txt")).reshape(3, 3)
    with open(os.path.join(d, "tless_poses.txt")) as f:
        p = int(f.readline().split()[0])
        poses = np.loadtxt(f).reshape(-1, 3, 4)
    assert poses.shape[0] == p, f"tless_poses.txt: expected {p} poses"
    return pts[:, :2], pts[:, 2:5], K, poses


def list_scenes(root: str = DEFAULT_ROOT):
    return sorted(
        n
        for n in os.listdir(root)
        if os.path.isfile(os.path.join(root, n, f"{n}.txt"))
    )
