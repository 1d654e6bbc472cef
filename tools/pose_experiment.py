"""Dev diagnostic: T-LESS multi-pose quality across seeds with kwarg
overrides — the measurement harness for VERDICT r3 item 4 (pose-0
rotation <= 8.25 deg, translation <= 16 mm across 3 seeds).

    python tools/pose_experiment.py --seeds 1,2,3 --set polish_trim=0.4
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_override(tok):
    if "=" not in tok:
        raise SystemExit(f"--set expects K=V, got {tok!r}")
    k, v = tok.split("=", 1)
    for cast in (int, float):
        try:
            return k, cast(v)
        except ValueError:
            continue
    return k, v


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", default="1,2,3")
    p.add_argument("--set", action="append", default=[], metavar="K=V")
    args = p.parse_args()
    overrides = dict(parse_override(s) for s in args.set)

    import numpy as np

    from progressivex_tpu import find6DPoses
    from progressivex_tpu.io.data import load_tless_scene
    from progressivex_tpu.io.metrics import pose_errors

    xy, xyz, K, gt_poses = load_tless_scene()
    kw = dict(threshold=4.0, conf=0.9, spatial_coherence_weight=0.1,
              neighborhood_ball_radius=20.0,
              maximum_tanimoto_similarity=0.9,
              max_iters=400, minimum_point_number=6)
    kw.update(overrides)
    print(f"overrides: {overrides}", file=sys.stderr, flush=True)

    seeds = [int(s) for s in args.seeds.split(",")]
    rots, trs = [], []
    for i, seed in enumerate(seeds):
        t0 = time.perf_counter()
        poses, labeling = find6DPoses(xy, xyz, K, **kw, random_seed=seed)
        dt = time.perf_counter() - t0
        k = poses.shape[0] // 3
        errs = pose_errors(
            [poses[3 * j:3 * j + 3] for j in range(k)], gt_poses)
        r = [round(float(x), 3) for x, _ in errs]
        t = [round(float(x), 3) for _, x in errs]
        rots.append(r)
        trs.append(t)
        print(f"seed {seed}: {k} instances, rot {r} deg, transl {t} mm "
              f"({dt:.2f}s{' incl compile' if i == 0 else ''})",
              flush=True)
    n_gt = min(len(r) for r in rots)
    for g in range(n_gt):
        rv = [r[g] for r in rots]
        tv = [t[g] for t in trs]
        print(f"pose-{g}: rot mean {np.mean(rv):.3f} max {np.max(rv):.3f} "
              f"deg | transl mean {np.mean(tv):.3f} max {np.max(tv):.3f} mm",
              flush=True)


if __name__ == "__main__":
    main()
