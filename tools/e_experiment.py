"""Dev diagnostic: essential-family bridge scene (gauntlet seed 0).

A genuine high-support E spans motion 1 + half of motion 2, wins round 1,
and the compound penalty then suppresses the true second motion (VERDICT
r2 weak #6 / next-step #7). Sweeps candidate levers on the seed-0/1/2
scenes and prints (K, ME) per configuration.

    python tools/e_experiment.py [--seeds 0 1 2]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("JAX_PLATFORMS", "cpu") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, nargs="*", default=[0, 1, 2])
    args = p.parse_args()

    from progressivex_tpu import findEssentialMatrices
    from progressivex_tpu.io.metrics import misclassification
    from tests.test_gauntlet import make_multi_motion_scene

    f = 800.0
    K = np.array([[f, 0, 320.0], [0, f, 240.0], [0, 0, 1.0]])
    base = dict(threshold=1.5, conf=0.5, spatial_coherence_weight=0.2,
                neighborhood_ball_radius=60.0,
                maximum_tanimoto_similarity=0.4, max_iters=1000,
                minimum_point_number=25, maximum_model_number=6,
                sampler_id=0, scoring_exponent=2, n_restarts=3)
    variants = {
        "baseline": {},
        "exp1": dict(scoring_exponent=1),
        "restart5+rule": dict(n_restarts=5),
        "exp1+restart5": dict(scoring_exponent=1, n_restarts=5),
    }
    for name, ov in variants.items():
        kw = dict(base, **ov)
        for seed in args.seeds:
            corrs, gt = make_multi_motion_scene(
                n_motions=2, pts_per=100, outlier_frac=0.5, seed=seed, f=f)
            t0 = time.perf_counter()
            E, lab = findEssentialMatrices(corrs, K, K, **kw,
                                           random_seed=seed)
            k = E.shape[0] // 3
            me = misclassification(lab, gt)
            print(f"{name:16s} seed {seed}: K={k} ME={me:.4f} "
                  f"({time.perf_counter() - t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
