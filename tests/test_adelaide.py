"""End-to-end regression gates on the bundled AdelaideRMF ground-truth
scenes, with the reference benchmark protocols (SURVEY.md §6).

Reference quality anchors: dataset mean ME 0.064 (H, 19 scenes) and 0.109
(F, 18 scenes); per-scene worst cases 0.207 / 0.367. The per-scene bounds
below are regression gates for the 6 bundled scenes (deterministic given
the fixed seed), not dataset claims.
"""

import os

import numpy as np
import pytest

from progressivex_tpu import findHomographies, findTwoViewMotions
from progressivex_tpu.io.data import DEFAULT_ROOT, load_corr_scene
from progressivex_tpu.io.metrics import misclassification

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DEFAULT_ROOT), reason="bundled scenes unavailable"
)

H_KW = dict(
    threshold=4.0, conf=0.5, spatial_coherence_weight=0.05,
    neighborhood_ball_radius=200.0, maximum_tanimoto_similarity=0.4,
    max_iters=1000, minimum_point_number=10, maximum_model_number=6,
    sampler_id=3, scoring_exponent=2,
)
F_KW = dict(
    threshold=0.75, conf=0.5, spatial_coherence_weight=0.5,
    neighborhood_ball_radius=50.0, maximum_tanimoto_similarity=0.4,
    max_iters=10000, minimum_point_number=7, maximum_model_number=4,
    sampler_id=2, scoring_exponent=1.0,
)


@pytest.mark.parametrize(
    "scene,bound",
    [("oldclassicswing", 0.05), ("unionhouse", 0.08), ("unihouse", 0.30)],
)
def test_adelaide_h_scene(scene, bound):
    corrs, gt = load_corr_scene(scene)
    _, labels = findHomographies(corrs, 0, 0, 0, 0, **H_KW)
    me = misclassification(labels, gt)
    assert me < bound, f"{scene}: ME={me:.3f}"


@pytest.mark.parametrize(
    "scene,bound",
    [("book", 0.06), ("breadcube", 0.06), ("cubetoy", 0.12)],
)
def test_adelaide_f_scene(scene, bound):
    corrs, gt = load_corr_scene(scene)
    _, labels = findTwoViewMotions(corrs, 0, 0, 0, 0, **F_KW)
    me = misclassification(labels, gt)
    assert me < bound, f"{scene}: ME={me:.3f}"


def test_adelaide_mean_beats_reference():
    """Mean ME over the bundled scenes must beat the reference dataset
    means (0.064 H / 0.109 F -> 0.087 combined)."""
    mes = []
    for s in ("oldclassicswing", "unionhouse", "unihouse"):
        corrs, gt = load_corr_scene(s)
        _, labels = findHomographies(corrs, 0, 0, 0, 0, **H_KW)
        mes.append(misclassification(labels, gt))
    for s in ("book", "breadcube", "cubetoy"):
        corrs, gt = load_corr_scene(s)
        _, labels = findTwoViewMotions(corrs, 0, 0, 0, 0, **F_KW)
        mes.append(misclassification(labels, gt))
    assert float(np.mean(mes)) < 0.087, mes
