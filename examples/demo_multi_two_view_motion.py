"""Multi two-view-motion demo on the bundled AdelaideRMF-F scenes — the
script equivalent of the reference's
`examples/example_multi_two_view_motion.ipynb` (242 correspondences -> 2
fundamental matrices; reference runtime 0.620 s — BASELINE.md). Runs the
reference notebook protocol on book / breadcube / cubetoy and reports
per-scene misclassification against the ground-truth labelings."""

import os
import sys
import time

try:
    import progressivex_tpu  # noqa: F401 — installed package
except ImportError:  # clean checkout without `pip install -e .`
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from progressivex_tpu import findTwoViewMotions
from progressivex_tpu.io.data import ADELAIDE_F_SCENES, load_corr_scene
from progressivex_tpu.io.metrics import misclassification


def main():
    for scene in ADELAIDE_F_SCENES:
        corrs, gt = load_corr_scene(scene)
        t0 = time.perf_counter()
        F, labeling = findTwoViewMotions(
            corrs,
            threshold=0.75, conf=0.5, spatial_coherence_weight=0.5,
            neighborhood_ball_radius=50.0, maximum_tanimoto_similarity=0.4,
            max_iters=10000, minimum_point_number=7, maximum_model_number=4,
            sampler_id=2, scoring_exponent=1.0,
        )
        dt = time.perf_counter() - t0
        k = F.shape[0] // 3
        me = misclassification(labeling, gt)
        print(f"{scene}: {len(gt)} corrs -> {k} motions in {dt:.3f}s, "
              f"misclassification {me:.3f}")


if __name__ == "__main__":
    main()
