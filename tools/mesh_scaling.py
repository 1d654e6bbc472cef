"""CPU-mesh scaling table for the public batched API (README evidence).

Runs `findHomographiesBatched` on the bundled ground-truth scenes,
replicated to a fixed lane count, over a virtual CPU mesh of 1/2/4/8
devices (`--xla_force_host_platform_device_count`), and prints one table
row per device count: wall time for the sharded pass, per-scene MEs, and
whether the labelings are bit-identical to the single-device run.

What the table does and does NOT show: virtual devices on a single host
core share the same ALUs, so wall time here validates that the SPMD
partition adds no divergence and no material dispatch overhead — it is
NOT a chip-scaling throughput claim. On real chips the scenes axis is
data-parallel with zero cross-device collectives inside the fit (one
final all-gather of per-lane winners, parallel/sharding.py), so lanes/s
scales with the chip count by construction; the real-hardware anchor is
the single-chip bench (bench.py).

Usage: python tools/mesh_scaling.py [--lanes 32] [--devices 1 2 4 8]
"""

import argparse
import os
import sys
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=32,
                    help="scene lanes (replicated over bundled scenes)")
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--repeats", type=int, default=3,
                    help="timed passes per device count (best is reported)")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={max(args.devices)}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from progressivex_tpu.api_batch import findHomographiesBatched
    from progressivex_tpu.eval.adelaide import H_PROTOCOL
    from progressivex_tpu.io.data import DEFAULT_ROOT, load_corr_scene
    from progressivex_tpu.io.metrics import misclassification

    names = ["oldclassicswing", "unionhouse", "unihouse"]
    scenes = [load_corr_scene(n, root=DEFAULT_ROOT) for n in names]
    corrs = [scenes[i % len(scenes)][0] for i in range(args.lanes)]
    gts = [scenes[i % len(scenes)][1] for i in range(args.lanes)]
    # Strip harness-only keys (bucket-size gating lives in the bench
    # harness; the batched API takes plain per-fit kwargs).
    kw = {k: v for k, v in H_PROTOCOL.items()
          if k not in ("split_pass", "split_pass_min_npad")}
    kw["random_seed"] = 0

    ref_labs = None
    print(f"lanes={args.lanes} scenes={names} (replicated), "
          f"host cores=1 (virtual devices share them)", file=sys.stderr)
    print("| devices | wall s/pass | mean ME | identical to 1-device |")
    print("|---|---|---|---|")
    for nd in args.devices:
        res = findHomographiesBatched(corrs, **kw, n_devices=nd)  # warm
        best = min(
            _timed(findHomographiesBatched, corrs, kw, nd)
            for _ in range(args.repeats)
        )
        labs = [lab for _, lab in res]
        mes = [misclassification(lab, gt) for lab, gt in zip(labs, gts)]
        if ref_labs is None:
            ref_labs = labs
            same = "(reference)"
        else:
            same = str(all(np.array_equal(a, b)
                           for a, b in zip(ref_labs, labs)))
        print(f"| {nd} | {best:.2f} | {float(np.mean(mes)):.4f} | {same} |")


def _timed(fn, corrs, kw, nd):
    t0 = time.perf_counter()
    fn(corrs, **kw, n_devices=nd)
    return time.perf_counter() - t0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
    main()
