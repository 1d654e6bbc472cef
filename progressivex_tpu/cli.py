"""Console entry points (pyproject [project.scripts]).

  progressivex-bench  — the driver benchmark: scene-batched AdelaideRMF
                        H + F throughput/quality, one JSON line on stdout.
  progressivex-eval   — per-scene evaluation with the reference notebook
                        protocols (downloads the full datasets when
                        reachable, else runs the bundled scenes).
"""

from __future__ import annotations

import argparse
import json
import sys


def bench_main(argv=None):
    from progressivex_tpu.eval.adelaide import throughput_batch

    p = argparse.ArgumentParser(description="AdelaideRMF throughput bench")
    p.add_argument("--problems", default="HF", help="subset of 'HF' to run")
    p.add_argument("--timing-runs", type=int, default=3,
                   help="timed executions per lane batch (best is reported)")
    args = p.parse_args(argv)
    out = {}
    for prob in args.problems.upper():
        r = throughput_batch(prob, n_timing_runs=args.timing_runs)
        print(
            f"{prob}: {r.scenes_per_sec:.2f} scenes/s ME={r.mean_me:.4f} "
            f"(batch={r.n_scenes}, full_dataset={r.full_dataset}, "
            f"compile={r.compile_seconds:.1f}s)",
            file=sys.stderr,
        )
        out[f"adelaide{prob}_scenes_per_sec"] = round(r.scenes_per_sec, 3)
        out[f"adelaide{prob}_mean_me"] = round(r.mean_me, 4)
        out[f"adelaide{prob}_full_dataset"] = r.full_dataset
        out[f"adelaide{prob}_dataset_pass_seconds"] = round(r.pass_seconds, 4)
    print(json.dumps(out))


def eval_main(argv=None):
    from progressivex_tpu.eval.adelaide import evaluate_scenes

    p = argparse.ArgumentParser(
        description="Per-scene AdelaideRMF evaluation (notebook protocol)"
    )
    p.add_argument("--problem", default="H", choices=["H", "F", "h", "f"])
    p.add_argument("--root", default=None, help="dataset directory override")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    res = evaluate_scenes(args.problem, root=args.root, seed=args.seed,
                          do_logging=True)
    print(json.dumps(res, indent=2))


if __name__ == "__main__":
    bench_main()
