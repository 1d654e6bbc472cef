"""Dev harness: iterate on F-protocol quality fast.

Runs the AdelaideRMF-F bundled scenes through the flattened-restart batch
path (same as eval/adelaide.throughput_batch) with config overrides from
the command line, reporting per-scene mean ME over several fresh-key runs
plus batch wall time. Usage:

    python tools/f_experiment.py --restarts 5 --hyp 512 --seeds 3 \
        [--cfg key=value ...] [--kw key=value ...]

--cfg overrides EngineConfig fields (static: recompiles), --kw overrides
the F protocol kwargs (dynamic where possible).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # The image's sitecustomize force-registers the remote TPU backend
    # with priority over the env var; config.update is the effective
    # override (same pattern as tests/conftest.py).
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--problem", default="F", choices=["H", "F"])
    p.add_argument("--restarts", type=int, default=None)
    p.add_argument("--hyp", type=int, default=None)
    p.add_argument("--seeds", type=int, default=3)
    p.add_argument("--lanes", type=int, default=32)
    p.add_argument("--cfg", nargs="*", default=[])
    p.add_argument("--kw", nargs="*", default=[])
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from progressivex_tpu.api import _hyp_budget, _n_subbatches
    from progressivex_tpu.core.config import EngineConfig, make_params
    from progressivex_tpu.core.engine import FitResult, compact_result, fit
    from progressivex_tpu.eval.adelaide import (
        F_PROTOCOL,
        H_PROTOCOL,
        discover_scenes,
    )
    from progressivex_tpu.io.data import load_corr_scene
    from progressivex_tpu.io.metrics import misclassification
    from progressivex_tpu.models import get_family

    kw = dict(F_PROTOCOL if args.problem == "F" else H_PROTOCOL)
    for kv in args.kw:
        k, v = kv.split("=", 1)
        kw[k] = type(kw.get(k, 1.0))(float(v)) if k in kw else float(v)
    family = get_family("fundamental" if args.problem == "F" else "homography")
    n_restarts = args.restarts if args.restarts is not None else int(
        kw.get("n_restarts", 1))

    n_hyp = args.hyp or _hyp_budget(
        kw["max_iters"], family.max_solutions, family.name)
    cfg_kw = dict(
        family=family.name,
        n_hypotheses=n_hyp,
        n_subbatches=_n_subbatches(kw["max_iters"], n_hyp),
        sampler_id=int(kw["sampler_id"]),
        magsac_levels=int(kw.get("magsac_levels", 0)),
        final_relabel=int(kw.get("final_relabel", 0)),
    )
    for kv in args.cfg:
        k, v = kv.split("=", 1)
        if v in ("True", "False"):
            cfg_kw[k] = v == "True"
        else:
            cfg_kw[k] = float(v) if "." in v else int(v)
    cfg = EngineConfig(**cfg_kw)
    print(f"cfg: {cfg}", file=sys.stderr)

    scene_root, names, full = discover_scenes(args.problem)
    scenes = [load_corr_scene(n, root=scene_root) for n in names]
    n_pad = 256 if args.problem == "F" else max(
        -(-max(s[0].shape[0] for s in scenes) // 128) * 128, 256)
    lanes = args.lanes
    lane_ids = [i % len(scenes) for i in range(lanes)]

    batch = np.zeros((lanes, n_pad, 4), np.float32)
    mask = np.zeros((lanes, n_pad), bool)
    wts = np.zeros((lanes, n_pad), np.float32)
    n_valids, gts = [], []
    for j, i in enumerate(lane_ids):
        corrs, gt = scenes[i]
        n = corrs.shape[0]
        batch[j, :n] = corrs
        mask[j, :n] = True
        wts[j, :n] = 1.0
        n_valids.append(n)
        gts.append(gt)
    data = jnp.array(np.concatenate([batch] * n_restarts))
    m = jnp.array(np.concatenate([mask] * n_restarts))
    w = jnp.array(np.concatenate([wts] * n_restarts))
    nv = jnp.array(np.array(n_valids * n_restarts, np.int32))
    ns = lanes * n_restarts

    params = make_params(
        threshold=kw["threshold"], confidence=kw["conf"],
        spatial_weight=kw["spatial_coherence_weight"],
        neighborhood_radius=kw["neighborhood_ball_radius"],
        max_tanimoto=kw["maximum_tanimoto_similarity"],
        min_inliers=kw["minimum_point_number"],
        max_models=kw["maximum_model_number"],
        scoring_exponent=kw["scoring_exponent"], n_valid=n_pad,
    )
    run = jax.jit(jax.vmap(
        lambda d, mm, ww, k, nvi: fit(
            family, cfg, params._replace(n_valid=nvi), d, mm, ww, k)))

    t0 = time.perf_counter()
    res = run(data, m, w, jax.random.split(jax.random.PRNGKey(0), ns), nv)
    np.asarray(res.n_models)
    print(f"compile: {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    mes = {}
    times = []
    for s in range(args.seeds):
        keys = jax.random.split(jax.random.PRNGKey(100 + s), ns)
        t0 = time.perf_counter()
        res = run(data, m, w, keys, nv)
        np.asarray(res.n_models)
        times.append(time.perf_counter() - t0)
        from progressivex_tpu.core.engine import select_restart

        rule = str(kw.get("restart_rule", "energy"))
        energy = np.asarray(res.energy).reshape(n_restarts, lanes)
        pref = np.asarray(res.compound_pref).reshape(n_restarts, lanes, -1)
        nmod = np.asarray(res.n_models).reshape(n_restarts, lanes)
        pick = np.array([
            int(select_restart(energy[:, j], pref[:, j], rule, nmod[:, j]))
            for j in range(lanes)
        ])
        for j in range(lanes):
            jj = pick[j] * lanes + j
            one = jax.tree.map(lambda x: np.asarray(x[jj]), res)
            _, labels = compact_result(FitResult(*one), n_valids[j])
            mes.setdefault(names[lane_ids[j]], []).append(
                misclassification(labels, gts[j]))
    ti = np.asarray(res.total_iters)
    rr = np.asarray(res.rounds_run)
    print(f"total_iters: mean {ti.mean():.0f} max {ti.max()} | "
          f"rounds: mean {rr.mean():.1f} max {rr.max()}")
    for name in sorted(mes):
        v = mes[name]
        print(f"{name}: mean ME {np.mean(v):.4f}  max {np.max(v):.4f} "
              f"(n={len(v)})")
    print(f"MEAN: {np.mean([np.mean(v) for v in mes.values()]):.4f}  "
          f"batch {min(times) * 1e3:.0f} ms "
          f"({lanes / min(times):.1f} scenes/s)")


if __name__ == "__main__":
    main()
