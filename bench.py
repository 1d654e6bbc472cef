"""Benchmark: AdelaideRMF-H multi-homography throughput on one TPU chip.

Protocol mirrors the reference notebook (`dataset_comparison/adelaideH.ipynb`
cell 3, see SURVEY.md §6): findHomographies with threshold 4.0, conf 0.5,
spatial weight 0.05, radius 200, tanimoto 0.4, max_iters 1000, min 10,
max models 6, NAPSAC sampling, exponent 2 — run on the bundled AdelaideRMF-H
scenes (oldclassicswing / unihouse / unionhouse).

Metric: scenes/second, steady-state, scene-batched (the TPU-native way to
run a dataset: one vmapped device program over padded scenes).
Baseline: the reference's 0.077 s/scene ≈ 13 scenes/s on CPU (BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from progressivex_tpu.core.config import EngineConfig, make_params
    from progressivex_tpu.io.data import ADELAIDE_H_SCENES, load_corr_scene
    from progressivex_tpu.io.metrics import misclassification
    from progressivex_tpu.parallel.sharding import fit_batch
    from progressivex_tpu.core.engine import compact_result, FitResult

    scenes = [load_corr_scene(n) for n in ADELAIDE_H_SCENES]
    n_pad = 2176  # >= unihouse (2084), multiple of 128
    reps = 8  # tile the 3 scenes to a throughput batch of 24
    batch, masks, weights, n_valids = [], [], [], []
    for corrs, _ in scenes:
        n = corrs.shape[0]
        d = np.zeros((n_pad, 4), np.float32)
        d[:n] = corrs
        m = np.zeros((n_pad,), bool)
        m[:n] = True
        batch.append(d)
        masks.append(m)
        w = np.zeros((n_pad,), np.float32)
        w[:n] = 1.0
        weights.append(w)
        n_valids.append(n)
    data = jnp.array(np.stack(batch * reps))
    mask = jnp.array(np.stack(masks * reps))
    wts = jnp.array(np.stack(weights * reps))
    n_scenes = data.shape[0]

    cfg = EngineConfig(family="homography", n_hypotheses=1000, sampler_id=3)
    params = make_params(
        threshold=4.0, confidence=0.5, spatial_weight=0.05,
        neighborhood_radius=200.0, max_tanimoto=0.4, min_inliers=10,
        max_models=6, scoring_exponent=2.0,
        n_valid=n_pad,  # overwritten per scene below
    )
    # n_valid varies per scene (pad rows are masked out everywhere else),
    # so it is vmapped alongside the data.
    nv = jnp.array(np.array(n_valids * reps, np.int32))

    import progressivex_tpu.core.engine as engine
    from progressivex_tpu.models import get_family

    family = get_family("homography")
    run = jax.jit(
        jax.vmap(
            lambda d, m, w, k, nvi: engine.fit(
                family, cfg, params._replace(n_valid=nvi), d, m, w, k
            )
        )
    )
    keys = jax.random.split(jax.random.PRNGKey(0), n_scenes)

    # Warmup / compile.
    t0 = time.perf_counter()
    res = run(data, mask, wts, keys, nv)
    jax.block_until_ready(res)
    compile_s = time.perf_counter() - t0
    print(f"compile+first run: {compile_s:.1f}s", file=sys.stderr)

    # Steady state. Vary the key each run (defeats any executable-level
    # result caching) and fetch a value to the host so the timing covers
    # actual execution, not just async dispatch.
    times = []
    for i in range(3):
        k = jax.random.split(jax.random.PRNGKey(i + 1), n_scenes)
        t0 = time.perf_counter()
        res = run(data, mask, wts, k, nv)
        np.asarray(res.n_models)  # host fetch = hard execution barrier
        times.append(time.perf_counter() - t0)
    dt = min(times)
    scenes_per_s = n_scenes / dt

    # Quality check on the 3 distinct scenes.
    mes = []
    for i, (corrs, gt) in enumerate(scenes):
        one = jax.tree.map(lambda x: np.asarray(x[i]), res)
        descs, labels = compact_result(FitResult(*one), n_valids[i])
        mes.append(misclassification(labels, gt))
    mean_me = float(np.mean(mes))
    print(
        f"scenes/s={scenes_per_s:.2f} dt={dt*1e3:.1f}ms/{n_scenes} scenes "
        f"ME={['%.3f' % m for m in mes]} mean={mean_me:.3f}",
        file=sys.stderr,
    )

    print(json.dumps({
        "metric": "adelaideH_scenes_per_sec",
        "value": round(scenes_per_s, 3),
        "unit": "scenes/s",
        "vs_baseline": round(scenes_per_s / 13.0, 3),
        "mean_misclassification": round(mean_me, 4),
        "baseline_misclassification": 0.064,
        "n_scenes_batched": n_scenes,
    }))


if __name__ == "__main__":
    main()
