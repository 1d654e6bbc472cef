"""Dev diagnostic: device-time profile of one bench bucket program.

VERDICT r3 item 8: the bench judges scenes/s but gives no op-level
attribution, so runtime regressions (e.g. the round-3 H 318->295
while->unroll cost) are guesswork. This tool traces N steady-state runs
of the exact _LaneBatch program with jax.profiler, parses the trace
(Chrome JSON, XLA Ops track), and prints the top-K ops by device time
plus a category rollup — the table docs/PROFILE.md records.

    python tools/profile_protocol.py --problem H --n-pad 384 --lanes 128
    python tools/profile_protocol.py --problem F --n-pad 256 --lanes 32

Trace parsing: pid/tid of the "XLA Ops" track are discovered from the
trace metadata (memory: vm.trace.json.gz, pid 3 on the tunneled v5e).
"""

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def categorize(name: str) -> str:
    """Rough op-category rollup for the summary table."""
    n = name.lower()
    if "fusion" in n:
        return "fusion (fused elementwise/reduce)"
    if any(k in n for k in ("dot", "convolution")):
        return "matmul/conv (MXU)"
    if any(k in n for k in ("sort", "top-k", "topk")):
        return "sort/top-k"
    if any(k in n for k in ("scatter", "gather", "dynamic-update", "dynamic-slice")):
        return "gather/scatter/slice"
    if any(k in n for k in ("all-reduce", "all-gather", "collective", "copy")):
        return "copy/collective"
    if "while" in n or "condition" in n:
        return "loop overhead"
    return "other"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--problem", default="H", choices=["H", "F"])
    p.add_argument("--n-pad", type=int, default=384)
    p.add_argument("--lanes", type=int, default=128)
    p.add_argument("--restarts", type=int, default=None)
    p.add_argument("--runs", type=int, default=3)
    p.add_argument("--top", type=int, default=10)
    p.add_argument("--trace-dir", default="/tmp/progx_profile")
    args = p.parse_args()

    import jax
    import numpy as np

    from progressivex_tpu.api import _hyp_budget, _n_subbatches
    from progressivex_tpu.core.config import EngineConfig
    from progressivex_tpu.eval.adelaide import (
        F_PROTOCOL, H_PROTOCOL, _LaneBatch, discover_scenes)
    from progressivex_tpu.io.data import load_corr_scene
    from progressivex_tpu.models import get_family

    kw = dict(H_PROTOCOL if args.problem == "H" else F_PROTOCOL)
    family = get_family(
        "homography" if args.problem == "H" else "fundamental")
    n_restarts = (args.restarts if args.restarts is not None
                  else int(kw.get("n_restarts", 1)))
    n_hyp = _hyp_budget(kw["max_iters"], family.max_solutions, family.name)
    cfg = EngineConfig(
        family=family.name,
        n_hypotheses=n_hyp,
        n_subbatches=_n_subbatches(kw["max_iters"], n_hyp),
        sampler_id=int(kw["sampler_id"]),
        magsac_levels=int(kw.get("magsac_levels", 0)),
        final_relabel=int(kw.get("final_relabel", 0)),
        max_rounds=int(kw.get("max_rounds", 10)),
        pearl_iters=int(kw.get("pearl_iters", 3)),
    )
    root, names, _ = discover_scenes(args.problem)
    scenes, snames = [], []
    for n in names:
        corrs, gt = load_corr_scene(n, root=root)
        if corrs.shape[0] <= args.n_pad:
            scenes.append((corrs, gt))
            snames.append(n)
    batch = _LaneBatch(family, cfg, kw, scenes, snames,
                       list(range(len(scenes))), args.n_pad, args.lanes,
                       n_restarts, seed=0)
    t0 = time.perf_counter()
    batch.compile()
    print(f"compile(+cache): {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    os.makedirs(args.trace_dir, exist_ok=True)
    with jax.profiler.trace(args.trace_dir):
        for i in range(args.runs):
            keys = jax.random.split(jax.random.PRNGKey(i + 1), batch.ns)
            res = batch.run(batch.data, batch.mask, batch.wts, keys,
                            batch.nv)
            np.asarray(res.n_models)

    traces = sorted(glob.glob(os.path.join(
        args.trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not traces:
        raise SystemExit(f"no trace written under {args.trace_dir}")
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    # Find the "XLA Ops" thread: process_name/thread_name metadata.
    ops_tids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            if "XLA Ops" in e.get("args", {}).get("name", ""):
                ops_tids.add((e.get("pid"), e.get("tid")))
    # SELF time per op: container ops (while/conditional bodies) emit
    # INCLUSIVE durations that cover their children on the same track, so
    # a plain sum double-counts. Per track, sort by start time and
    # subtract each event's directly-nested children via a stack sweep.
    by_track = defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in ops_tids:
            by_track[(e["pid"], e["tid"])].append(
                (e["ts"], e["ts"] + e.get("dur", 0.0), e["name"],
                 e.get("dur", 0.0)))
    per_op = defaultdict(float)
    total = 0.0
    for evs in by_track.values():
        evs.sort(key=lambda x: (x[0], -x[1]))
        stack = []  # (end, name, self_dur_accum_index)
        selfs = []
        for ts, te, name, dur in evs:
            while stack and stack[-1][0] <= ts:
                stack.pop()
            if stack:
                # Subtract this event's full span from its parent's self.
                selfs[stack[-1][1]][1] -= dur
            selfs.append([name, dur])
            stack.append((te, len(selfs) - 1))
        for name, sd in selfs:
            sd = max(sd, 0.0)
            per_op[name] += sd
            total += sd
    if not per_op:
        raise SystemExit("no XLA Ops events found in the trace")

    print(f"\n{args.problem} n_pad={args.n_pad} {args.lanes}x{n_restarts} "
          f"rows, {args.runs} runs, device total {total / 1e3:.1f} ms")
    print(f"\n| rank | op | device ms | % |\n|---|---|---|---|")
    ranked = sorted(per_op.items(), key=lambda kv: -kv[1])
    for i, (name, dur) in enumerate(ranked[:args.top], 1):
        print(f"| {i} | `{name[:60]}` | {dur / 1e3:.2f} | "
              f"{100 * dur / total:.1f}% |")
    cats = defaultdict(float)
    for name, dur in per_op.items():
        cats[categorize(name)] += dur
    print(f"\n| category | device ms | % |\n|---|---|---|")
    for name, dur in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"| {name} | {dur / 1e3:.2f} | {100 * dur / total:.1f}% |")


if __name__ == "__main__":
    main()
