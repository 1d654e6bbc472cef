"""Per-scene ME regression gates under the BENCH protocols (VERDICT r4
item 6): the bundled AdelaideRMF scenes run through the exact notebook
protocols the bench uses (eval/adelaide.H_PROTOCOL / F_PROTOCOL, including
the measured knee extensions), with per-scene ceilings set from the
round-3/4 bench measurements so a quality regression fails tests instead
of surfacing in the bench tail.

Bench-measured per-scene means (hundreds of fresh-seed lane runs, r3/r4
tails): oldclassicswing 0.0077, unionhouse 0.0120, unihouse 0.0708,
book 0.0160, breadcube 0.0126, cubetoy 0.0278. Gates take the median of 3
seeds against those means with tail margin (oldclassicswing's magsac tail
reaches ~0.05 on single rolls, hence 0.015 over the judge's 0.01).
Reference per-scene values on the same scenes (saved notebook outputs):
oldclassicswing 0.005, unionhouse 0.006, unihouse 0.186, book 0.032,
breadcube 0.017, cubetoy 0.012.
"""

import os

import numpy as np
import pytest

from progressivex_tpu.eval.adelaide import evaluate_scenes
from progressivex_tpu.io.data import DEFAULT_ROOT

pytestmark = [
    pytest.mark.skipif(
        not os.path.isdir(DEFAULT_ROOT), reason="bundled scenes unavailable"
    ),
    pytest.mark.slow,
]

H_CEILINGS = {"oldclassicswing": 0.015, "unionhouse": 0.03,
              "unihouse": 0.075}
F_CEILINGS = {"book": 0.02, "breadcube": 0.02, "cubetoy": 0.03}

_SEEDS = (0, 1, 2)


def _median_per_scene(problem):
    # root=None: discover via the download-or-bundled-fallback path, which
    # returns the problem-specific scene list (an explicit root would list
    # every scene directory regardless of problem).
    runs = [evaluate_scenes(problem, root=None, seed=s)["per_scene"]
            for s in _SEEDS]
    return {
        name: float(np.median([r[name]["me"] for r in runs]))
        for name in runs[0]
    }


def test_bench_protocol_h_per_scene_gates():
    med = _median_per_scene("H")
    for scene, ceiling in H_CEILINGS.items():
        assert med[scene] <= ceiling, (
            f"H {scene}: median ME {med[scene]:.4f} > {ceiling}")


def test_bench_protocol_f_per_scene_gates():
    med = _median_per_scene("F")
    for scene, ceiling in F_CEILINGS.items():
        assert med[scene] <= ceiling, (
            f"F {scene}: median ME {med[scene]:.4f} > {ceiling}")
