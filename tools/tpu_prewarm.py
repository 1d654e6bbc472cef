"""Pre-warm the persistent compilation cache for the HF protocol + pose
programs, timing each compile.

NOTE: the canonical full prewarm is now simply `python bench.py` with a
generous PROGX_BENCH_BUDGET_S — it compiles EVERY program the driver's
capture touches (HF buckets, pose, lines, VP, essential, synth sweep)
into the active cache directory. The checkout ships those entries in
`.jax_cache/` (see progressivex_tpu.__init__._enable_compile_cache), so
a fresh container's bench run loads executables in seconds. This tool
remains for quick per-protocol rewarms during development.

Usage: timeout 3600 python tools/tpu_prewarm.py [HF|H|F|pose|all]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(which="all"):
    t_all = time.perf_counter()
    if which in ("all", "HF", "H", "F"):
        from progressivex_tpu.eval.adelaide import (
            _compile_sequential, _prepare_lane_batches)

        problems = [p for p in "HF" if which in ("all", "HF", p)]
        prepared = {p: _prepare_lane_batches(p, None, 0) for p in problems}
        batches = [b for lbs, _ in prepared.values() for b in lbs]
        for b in batches:
            t0 = time.perf_counter()
            b.compile()
            print(f"[prewarm] bucket n_pad={b.n_pad} lanes={b.lanes} "
                  f"x{b.n_restarts}: {time.perf_counter() - t0:.1f}s",
                  flush=True)
    if which in ("all", "pose"):
        from progressivex_tpu import find6DPoses
        from progressivex_tpu.io.data import load_tless_scene

        xy, xyz, K, _ = load_tless_scene()
        t0 = time.perf_counter()
        find6DPoses(xy, xyz, K, threshold=4.0, conf=0.9,
                    spatial_coherence_weight=0.1,
                    neighborhood_ball_radius=20.0,
                    maximum_tanimoto_similarity=0.9, max_iters=400,
                    minimum_point_number=6, random_seed=0)
        print(f"[prewarm] pose program: {time.perf_counter() - t0:.1f}s",
              flush=True)
    print(f"[prewarm] total {time.perf_counter() - t_all:.1f}s")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
