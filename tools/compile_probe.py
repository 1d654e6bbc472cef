"""Dev diagnostic: time the cold compile of one bench bucket program.

Builds the exact _LaneBatch program the eval harness runs (protocol kwargs
included) with optional EngineConfig overrides, times .compile(), then
times a steady-state run. Used to chase the TPU cold-compile cliff and the
memory-space-assignment check-fail (VERDICT round 2 items 1-2).

    python tools/compile_probe.py --problem F --n-pad 256 --lanes 32 \
        --set unroll_icm=1 --set unroll_pearl=1
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_override(tok: str):
    """K=V -> (K, int|float|str) with int-first coercion (ADVICE r2)."""
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
    p.add_argument("--problem", default="F", choices=["H", "F"])
    p.add_argument("--n-pad", type=int, default=256)
    p.add_argument("--lanes", type=int, default=32)
    p.add_argument("--restarts", type=int, default=None)
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--set", action="append", default=[], metavar="K=V")
    p.add_argument("--no-cache", action="store_true",
                   help="disable the persistent compile cache for a true "
                        "cold measurement")
    p.add_argument("--score", action="store_true",
                   help="also score per-scene MEs over the timing runs "
                        "(the bench's time_and_score path)")
    p.add_argument("--jit", action="store_true",
                   help="skip the AOT lower/compile split and compile via "
                        "the first jit call (the bench-visible path; AOT "
                        "executables hit a ~400s first-execution stall on "
                        "the tunneled backend that plain jit does not)")
    args = p.parse_args()

    if args.no_cache:
        # PROGX_COMPILE_CACHE, not JAX_COMPILATION_CACHE_DIR="": the
        # package treats an EMPTY jax env var as unset and installs its
        # own cache dir (progressivex_tpu._enable_compile_cache).
        os.environ["PROGX_COMPILE_CACHE"] = "off"

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
    if args.set:
        ov = dict(parse_override(s) for s in args.set)
        cfg = dataclasses.replace(cfg, **ov)
        print(f"overrides: {ov}", file=sys.stderr)

    root, names, _ = discover_scenes(args.problem)
    # Pick scenes that fit the requested pad level.
    picks = []
    for n in names:
        corrs, gt = load_corr_scene(n, root=root)
        if corrs.shape[0] <= args.n_pad:
            picks.append((n, (corrs, gt)))
    if not picks:
        raise SystemExit(f"no scene fits n_pad={args.n_pad}")
    scenes = [s for _, s in picks]
    snames = [n for n, _ in picks]
    chunk = list(range(len(scenes)))
    batch = _LaneBatch(family, cfg, kw, scenes, snames, chunk, args.n_pad,
                       args.lanes, n_restarts, seed=0)
    print(f"{args.problem} n_pad={args.n_pad} lanes={args.lanes} "
          f"x{n_restarts} restarts = {batch.ns} rows, "
          f"hyp={cfg.n_hypotheses}x{family.max_solutions}",
          file=sys.stderr, flush=True)
    if args.jit:
        t0 = time.perf_counter()
        batch.compile()
        print(f"compile+first run (jit): {time.perf_counter() - t0:.1f}s",
              flush=True)
    else:
        # AOT split: trace+lower happens on the host, compile on the
        # backend service — the cliff lives in the latter, but a 10x
        # unrolled graph can also blow up the former.
        keys0 = jax.random.split(jax.random.PRNGKey(0), batch.ns)
        t0 = time.perf_counter()
        lowered = batch.run.lower(batch.data, batch.mask, batch.wts, keys0,
                                  batch.nv)
        t1 = time.perf_counter()
        print(f"lower: {t1 - t0:.1f}s", flush=True)
        compiled = lowered.compile()
        t2 = time.perf_counter()
        print(f"compile: {t2 - t1:.1f}s (total {t2 - t0:.1f}s)", flush=True)
        batch.run = compiled
    if args.score:
        mes: dict = {}
        batch.time_and_score(args.problem, args.runs, mes)
        for nm, v in sorted(mes.items()):
            print(f"ME {nm}: mean {float(np.mean(v)):.4f} "
                  f"over {len(v)} runs", flush=True)
        print(f"mean ME: {float(np.mean([np.mean(v) for v in mes.values()])):.4f}",
              flush=True)
    else:
        for i in range(args.runs):
            keys = jax.random.split(jax.random.PRNGKey(i + 1), batch.ns)
            t0 = time.perf_counter()
            res = batch.run(batch.data, batch.mask, batch.wts, keys,
                            batch.nv)
            np.asarray(res.n_models)
            dt = time.perf_counter() - t0
            print(f"run {i}: {dt * 1e3:.1f} ms "
                  f"({args.lanes / dt:.1f} scenes/s)", flush=True)


if __name__ == "__main__":
    main()
