"""Batched multi-scene front ends — the TPU-native way to run a dataset.

The reference processes scenes one `find*` call at a time
(`dataset_comparison/adelaideH.ipynb` cell 4 loops over 19 scenes); on a
TPU the idiomatic layout is one vmapped program per scene-size bucket
with every scene a lane of the device batch. These entry points expose
that layout as a public API (the eval harness uses the same recipe for
the throughput bench, eval/adelaide._LaneBatch):

  * scenes are grouped by padded size (api.PAD_LEVELS) — one compiled
    program per (family, config, pad level, lane count) actually touched,
  * lane counts pad up to the next power of two (cyclic replication) so
    datasets of slightly different sizes share programs,
  * restarts are flattened into the lane axis (NOT nested vmaps: a
    restart vmap inside the scene vmap reliably crashes the TPU
    compiler's memory-space-assignment pass above ~32 lanes) and the
    per-scene winner is chosen by `engine.select_restart`,
  * per-lane `n_valid`/`threshold` ride in as vmapped runtime values, so
    mixed scene sizes (and, for calibrated families, per-scene focal
    lengths) share one program.

Outputs match the single-scene front ends element for element: the
labeling convention and descriptor shapes are those of
`progressivex_python.cpp:150-168,286-301,523-532,648-663`.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from progressivex_tpu import api as _api
from progressivex_tpu.core import engine
from progressivex_tpu.core.config import EngineConfig, make_params
from progressivex_tpu.models import get_family


def _next_pow2(n: int) -> int:
    return 1 << max(n - 1, 0).bit_length()


@functools.lru_cache(maxsize=32)
def _compiled_fit_rows(family_name: str, cfg: EngineConfig, n_pad: int,
                       rows: int, has_graph: bool, mesh=None):
    """One program per (family, config, pad level, row count): vmapped
    over rows with per-row n_valid and threshold as runtime values.

    With a mesh (a jax.sharding.Mesh with a "scenes" axis), the row axis
    shards across the mesh via shard_map — scene parallelism is pure SPMD
    with zero communication (SURVEY.md §2.4: the TPU-native scaling axis
    the single-threaded reference lacks). `rows` must be divisible by the
    scenes-axis size; jax.sharding.Mesh hashes by device grid + axis
    names, so it participates in the lru key like the config does."""
    family = get_family(family_name)

    def run(data, mask, weights, keys, params, n_valids, thresholds,
            graph_data):
        def one(d, m, w, k, nv, th, gd):
            p = params._replace(n_valid=nv, threshold=th)
            return engine.fit(family, cfg, p, d, m, w, k,
                              gd if has_graph else None)

        return jax.vmap(one)(data, mask, weights, keys, n_valids,
                             thresholds, graph_data)

    if mesh is None:
        return jax.jit(run)

    from jax.sharding import PartitionSpec as P

    spec = P("scenes")
    sharded = jax.shard_map(
        run,
        mesh=mesh,
        # params (index 4) is a replicated pytree of scalars; every other
        # input carries a leading row axis that shards across scenes.
        in_specs=(spec, spec, spec, spec, P(), spec, spec, spec),
        out_specs=spec,
        # The per-row PRNG fold makes the carry varying after round 0;
        # skip the static varying-mesh-axes check (see parallel/sharding).
        check_vma=False,
    )
    return jax.jit(sharded)


def _resolve_mesh(mesh, n_devices):
    """Build/validate the scenes mesh for the batched front ends."""
    if mesh is not None:
        if "scenes" not in mesh.axis_names:
            raise ValueError("mesh must have a 'scenes' axis")
        return mesh
    if n_devices is None or int(n_devices) <= 1:
        return None
    from progressivex_tpu.parallel.sharding import make_mesh

    return make_mesh(int(n_devices), 1)


def _run_batched(
    family_name,
    datas,  # list of [n_i, d] float arrays (already normalized per family)
    weights_list,  # list of [n_i] or None
    *,
    thresholds,  # scalar or per-scene list (calibrated families)
    conf,
    spatial_coherence_weight,
    neighborhood_ball_radius,
    maximum_tanimoto_similarity,
    max_iters,
    minimum_point_number,
    maximum_model_number,
    sampler_id,
    scoring_exponent,
    graph_datas=None,  # list of [n_i, d'] or None
    random_seed=0,
    n_restarts=1,
    restart_rule="energy",
    magsac_levels=0,
    final_relabel=0,
    final_polish=0,
    lo_spatial_lambda=0.5,
    max_rounds=10,
    pearl_iters=3,
    split_pass=0,
    do_logging=False,
    mesh=None,
    n_devices=None,
):
    mesh = _resolve_mesh(mesh, n_devices)
    n_scenes = len(datas)
    th_vec = np.broadcast_to(
        np.asarray(thresholds, np.float32), (n_scenes,)
    ).copy()
    n_hyp = _api._hyp_budget(
        max_iters, get_family(family_name).max_solutions, family_name
    )
    cfg = EngineConfig(
        family=family_name,
        n_hypotheses=n_hyp,
        n_subbatches=_api._n_subbatches(max_iters, n_hyp),
        sampler_id=int(sampler_id),
        lo_spatial_lambda=lo_spatial_lambda,
        n_restarts=1,  # flattened into the row axis below
        final_polish=int(final_polish),
        final_relabel=int(final_relabel),
        magsac_levels=int(magsac_levels),
        restart_rule=str(restart_rule),
        max_rounds=int(max_rounds),
        pearl_iters=int(pearl_iters),
        split_pass=int(split_pass),
    )
    params = make_params(
        threshold=float(th_vec[0]),  # replaced per row inside the program
        confidence=conf,
        spatial_weight=spatial_coherence_weight,
        neighborhood_radius=neighborhood_ball_radius,
        max_tanimoto=maximum_tanimoto_similarity,
        min_inliers=minimum_point_number,
        max_models=(maximum_model_number if maximum_model_number > 0
                    else _api._UNLIMITED),
        scoring_exponent=scoring_exponent,
        n_valid=0,
    )
    has_graph = graph_datas is not None
    n_restarts = max(int(n_restarts), 1)

    # Group scenes by pad level.
    buckets: dict[int, list[int]] = {}
    for i, d in enumerate(datas):
        buckets.setdefault(_api._pad_to(d.shape[0]), []).append(i)

    results: list = [None] * n_scenes
    n_scene_axis = 1 if mesh is None else mesh.shape["scenes"]
    for n_pad in sorted(buckets):
        idxs = buckets[n_pad]
        # Lanes cover the scenes AND divide evenly over the mesh's scenes
        # axis (both are powers of two, so max() suffices); total rows
        # (lanes * n_restarts) then also divide evenly.
        lanes = max(_next_pow2(len(idxs)), _next_pow2(n_scene_axis))
        lane_ids = [idxs[j % len(idxs)] for j in range(lanes)]
        d_dim = datas[idxs[0]].shape[1]
        data = np.zeros((lanes, n_pad, d_dim), np.float32)
        mask = np.zeros((lanes, n_pad), bool)
        wts = np.zeros((lanes, n_pad), np.float32)
        nv = np.zeros((lanes,), np.int32)
        th = np.zeros((lanes,), np.float32)
        gd = np.zeros(
            (lanes, n_pad,
             graph_datas[idxs[0]].shape[1] if has_graph else d_dim),
            np.float32,
        )
        for j, i in enumerate(lane_ids):
            n = datas[i].shape[0]
            data[j, :n] = datas[i]
            mask[j, :n] = True
            wts[j, :n] = (1.0 if weights_list is None
                          or weights_list[i] is None
                          else np.asarray(weights_list[i],
                                          np.float32).reshape(-1)[:n])
            nv[j] = n
            th[j] = th_vec[i]
            if has_graph:
                gd[j, :n] = graph_datas[i]
        rows = lanes * n_restarts
        tile = lambda a: jnp.asarray(np.concatenate([a] * n_restarts))
        fit_fn = _compiled_fit_rows(family_name, cfg, n_pad, rows, has_graph,
                                    mesh)
        # Row keys derive from (scene index, restart replica), NOT the row
        # position: results are then invariant to the lane padding and to
        # the mesh size (a scene fitted alone, in a bigger batch, or
        # sharded over 8 devices returns the identical labeling —
        # tests/test_batch_mesh.py gates this). Filler lanes (cyclic
        # replication past the scene list) share their original's key and
        # are discarded below.
        base = jax.random.fold_in(
            jax.random.PRNGKey(int(random_seed)), n_pad)
        sids = jnp.asarray(
            np.tile(np.asarray(lane_ids, np.uint32), n_restarts))
        rids = jnp.asarray(
            np.repeat(np.arange(n_restarts, dtype=np.uint32), lanes))
        keys = jax.vmap(
            lambda s, r: jax.random.fold_in(jax.random.fold_in(base, s), r)
        )(sids, rids)
        res = fit_fn(tile(data), tile(mask), tile(wts), keys, params,
                     tile(nv), tile(th), tile(gd))
        res = jax.tree.map(np.asarray, res)
        energy = res.energy.reshape(n_restarts, lanes)
        pref = res.compound_pref.reshape(n_restarts, lanes, -1)
        nmod = res.n_models.reshape(n_restarts, lanes)
        for j, i in enumerate(lane_ids[: len(idxs)]):
            # numpy inputs keep the per-lane selection on the HOST — a
            # per-lane device op costs a tunnel round trip (see
            # engine.select_restart).
            r = int(engine.select_restart(
                energy[:, j], pref[:, j],
                restart_rule if n_restarts > 1 else "energy",
                nmod[:, j],
            ))
            one = jax.tree.map(lambda x, rr=r * lanes + j: x[rr], res)
            descs, labels = engine.compact_result(one, int(nv[j]))
            results[i] = (descs, labels)
        if do_logging:
            import sys

            print(
                f"[progressivex_tpu.batch] {family_name} n_pad={n_pad}: "
                f"{len(idxs)} scenes ({lanes} lanes x {n_restarts} "
                "restarts)",
                file=sys.stderr,
            )
    return results


def findHomographiesBatched(
    corrs_list,
    threshold=4.0,
    conf=0.5,
    spatial_coherence_weight=0.0,
    neighborhood_ball_radius=200.0,
    maximum_tanimoto_similarity=0.4,
    max_iters=1000,
    minimum_point_number=10,
    maximum_model_number=-1,
    sampler_id=3,
    scoring_exponent=2,
    do_logging=False,
    random_seed=0,
    n_restarts=1,
    magsac_levels=4,
    final_relabel=2,
    max_rounds=10,
    pearl_iters=3,
    split_pass=0,
    mesh=None,
    n_devices=None,
    **engine_kwargs,
):
    """Multi-homography fitting over a LIST of scenes in one device batch.
    Each element of corrs_list is an [n_i, 4] array; returns a list of
    ([3K_i, 3] stacked H rows, labeling_i) in input order — element-wise
    identical format to `findHomographies`."""
    datas = []
    for corrs in corrs_list:
        corrs = np.asarray(corrs, np.float64)
        if corrs.ndim != 2 or corrs.shape[1] != 4 or corrs.shape[0] < 4:
            raise ValueError(
                "every corrs should be an array with dims [n,4], n>=4")
        datas.append(np.ascontiguousarray(corrs, np.float32))
    out = _run_batched(
        "homography", datas, None,
        thresholds=threshold, conf=conf,
        spatial_coherence_weight=spatial_coherence_weight,
        neighborhood_ball_radius=neighborhood_ball_radius,
        maximum_tanimoto_similarity=maximum_tanimoto_similarity,
        max_iters=max_iters, minimum_point_number=minimum_point_number,
        maximum_model_number=maximum_model_number, sampler_id=sampler_id,
        scoring_exponent=scoring_exponent, do_logging=do_logging,
        random_seed=random_seed, n_restarts=n_restarts,
        magsac_levels=magsac_levels, final_relabel=final_relabel,
        max_rounds=max_rounds, pearl_iters=pearl_iters,
        split_pass=split_pass,
        mesh=mesh, n_devices=n_devices, **engine_kwargs,
    )
    return [(d.reshape(-1, 3).astype(np.float64), l) for d, l in out]


def findTwoViewMotionsBatched(
    corrs_list,
    threshold=4.0,
    conf=0.5,
    spatial_coherence_weight=0.0,
    neighborhood_ball_radius=200.0,
    maximum_tanimoto_similarity=0.4,
    max_iters=1000,
    minimum_point_number=10,
    maximum_model_number=-1,
    sampler_id=3,
    scoring_exponent=3,
    do_logging=False,
    random_seed=0,
    n_restarts=4,
    magsac_levels=4,
    final_relabel=2,
    restart_rule="energy+5k",
    max_rounds=10,
    pearl_iters=3,
    split_pass=0,
    mesh=None,
    n_devices=None,
    **engine_kwargs,
):
    """Multi two-view-motion fitting over a LIST of scenes in one device
    batch. Returns a list of ([3K_i, 3] stacked F rows, labeling_i);
    defaults (4 energy-selected restarts, sigma-marginalized ranking,
    final relabel) match `findTwoViewMotions`."""
    datas = []
    for corrs in corrs_list:
        corrs = np.asarray(corrs, np.float64)
        if corrs.ndim != 2 or corrs.shape[1] != 4 or corrs.shape[0] < 7:
            raise ValueError(
                "every corrs should be an array with dims [n,4], n>=7")
        datas.append(np.ascontiguousarray(corrs, np.float32))
    out = _run_batched(
        "fundamental", datas, None,
        thresholds=threshold, conf=conf,
        spatial_coherence_weight=spatial_coherence_weight,
        neighborhood_ball_radius=neighborhood_ball_radius,
        maximum_tanimoto_similarity=maximum_tanimoto_similarity,
        max_iters=max_iters, minimum_point_number=minimum_point_number,
        maximum_model_number=maximum_model_number, sampler_id=sampler_id,
        scoring_exponent=scoring_exponent, do_logging=do_logging,
        random_seed=random_seed, n_restarts=n_restarts,
        magsac_levels=magsac_levels, final_relabel=final_relabel,
        restart_rule=restart_rule, max_rounds=max_rounds,
        pearl_iters=pearl_iters, split_pass=split_pass,
        mesh=mesh, n_devices=n_devices, **engine_kwargs,
    )
    return [(d.reshape(-1, 3).astype(np.float64), l) for d, l in out]


def findLinesBatched(
    points_list,
    weights_list=None,
    threshold=2.0,
    conf=0.5,
    spatial_coherence_weight=0.0,
    neighborhood_ball_radius=200.0,
    maximum_tanimoto_similarity=0.4,
    max_iters=1000,
    minimum_point_number=10,
    maximum_model_number=-1,
    sampler_id=3,
    scoring_exponent=2,
    do_logging=False,
    random_seed=0,
    n_restarts=1,
    mesh=None,
    n_devices=None,
    **engine_kwargs,
):
    """Multi 2D-line fitting over a LIST of point sets in one device
    batch. Returns a list of ([K_i, 3] (a,b,c) lines, labeling_i).
    `engine_kwargs` forwards the engine extensions the single-scene front
    end takes (max_rounds, pearl_iters, split_pass, final_relabel,
    magsac_levels, restart_rule, ...)."""
    datas = []
    for points in points_list:
        points = np.asarray(points, np.float64)
        if points.ndim != 2 or points.shape[1] != 2 or points.shape[0] < 2:
            raise ValueError(
                "every points should be an array with dims [n,2], n>=2")
        datas.append(np.ascontiguousarray(points, np.float32))
    sid = {0: 0, 1: 1, 2: 3, 3: 3}.get(int(sampler_id), 0)
    out = _run_batched(
        "line2d", datas, weights_list,
        thresholds=threshold, conf=conf,
        spatial_coherence_weight=spatial_coherence_weight,
        neighborhood_ball_radius=neighborhood_ball_radius,
        maximum_tanimoto_similarity=maximum_tanimoto_similarity,
        max_iters=max_iters, minimum_point_number=minimum_point_number,
        maximum_model_number=maximum_model_number, sampler_id=sid,
        scoring_exponent=scoring_exponent, do_logging=do_logging,
        random_seed=random_seed, n_restarts=n_restarts,
        mesh=mesh, n_devices=n_devices, **engine_kwargs,
    )
    return [(d.astype(np.float64), l) for d, l in out]


def findVanishingPointsBatched(
    lines_list,
    weights_list=None,
    threshold=4.0,
    conf=0.5,
    spatial_coherence_weight=0.0,
    neighborhood_ball_radius=200.0,
    maximum_tanimoto_similarity=0.4,
    max_iters=1000,
    minimum_point_number=10,
    maximum_model_number=-1,
    sampler_id=3,
    scoring_exponent=2,
    do_logging=False,
    random_seed=0,
    n_restarts=1,
    mesh=None,
    n_devices=None,
    **engine_kwargs,
):
    """Multi vanishing-point fitting over a LIST of segment sets in one
    device batch. Returns a list of ([K_i, 3] unit VPs, labeling_i).
    `engine_kwargs` forwards the engine extensions the single-scene front
    end takes (max_rounds, pearl_iters, split_pass, final_relabel,
    magsac_levels, restart_rule, ...)."""
    datas = []
    for lines in lines_list:
        lines = np.asarray(lines, np.float64)
        if lines.ndim != 2 or lines.shape[1] != 4 or lines.shape[0] < 2:
            raise ValueError(
                "every lines should be an array with dims [n,4], n>=2")
        datas.append(np.ascontiguousarray(lines, np.float32))
    sid = int(sampler_id) if int(sampler_id) in (0, 1) else 0
    out = _run_batched(
        "vanishing_point", datas, weights_list,
        thresholds=threshold, conf=conf,
        spatial_coherence_weight=spatial_coherence_weight,
        neighborhood_ball_radius=neighborhood_ball_radius,
        maximum_tanimoto_similarity=maximum_tanimoto_similarity,
        max_iters=max_iters, minimum_point_number=minimum_point_number,
        maximum_model_number=maximum_model_number, sampler_id=sid,
        scoring_exponent=scoring_exponent, do_logging=do_logging,
        random_seed=random_seed, n_restarts=n_restarts,
        mesh=mesh, n_devices=n_devices, **engine_kwargs,
    )
    return [(d.astype(np.float64), l) for d, l in out]


def findEssentialMatricesBatched(
    corrs_list,
    K1_list,
    K2_list,
    threshold=0.75,
    conf=0.5,
    spatial_coherence_weight=0.1,
    neighborhood_ball_radius=200.0,
    maximum_tanimoto_similarity=0.4,
    max_iters=1000,
    minimum_point_number=10,
    maximum_model_number=-1,
    sampler_id=0,
    scoring_exponent=2,
    do_logging=False,
    random_seed=0,
    n_restarts=1,
    mesh=None,
    n_devices=None,
    **engine_kwargs,
):
    """Multi essential-matrix fitting over a LIST of scenes in one device
    batch (extension — see `findEssentialMatrices`). K1_list/K2_list are
    one [3,3] per scene OR a single shared [3,3]; per-scene K^-1
    normalization and threshold/focal scaling ride in as vmapped runtime
    values. `engine_kwargs` forwards the engine extensions the
    single-scene front end takes. Returns a list of ([3K_i, 3] stacked E
    rows in NORMALIZED coordinates, labeling_i)."""
    n_scenes = len(corrs_list)
    K1s = (list(K1_list) if isinstance(K1_list, (list, tuple))
           else [K1_list] * n_scenes)
    K2s = (list(K2_list) if isinstance(K2_list, (list, tuple))
           else [K2_list] * n_scenes)
    if len(K1s) != n_scenes or len(K2s) != n_scenes:
        raise ValueError("corrs_list, K1_list, K2_list length mismatch")
    datas, graphs, ths = [], [], []
    for corrs, K1, K2 in zip(corrs_list, K1s, K2s):
        corrs = np.asarray(corrs, np.float64)
        if corrs.ndim != 2 or corrs.shape[1] != 4 or corrs.shape[0] < 5:
            raise ValueError(
                "every corrs should be an array with dims [n,4], n>=5")
        K1 = np.asarray(K1, np.float64)
        K2 = np.asarray(K2, np.float64)
        if K1.shape != (3, 3) or K2.shape != (3, 3):
            raise ValueError("every K1/K2 should be arrays with dims [3,3]")
        ones = np.ones((corrs.shape[0], 1))
        n1 = (np.concatenate([corrs[:, :2], ones], 1)
              @ np.linalg.inv(K1).T)[:, :2]
        n2 = (np.concatenate([corrs[:, 2:4], ones], 1)
              @ np.linalg.inv(K2).T)[:, :2]
        datas.append(np.ascontiguousarray(
            np.concatenate([n1, n2], axis=1), np.float32))
        graphs.append(np.ascontiguousarray(corrs, np.float32))
        ths.append(threshold / (0.25 * (K1[0, 0] + K1[1, 1]
                                        + K2[0, 0] + K2[1, 1])))
    out = _run_batched(
        "essential", datas, None,
        thresholds=ths, conf=conf,
        spatial_coherence_weight=spatial_coherence_weight,
        neighborhood_ball_radius=neighborhood_ball_radius,
        maximum_tanimoto_similarity=maximum_tanimoto_similarity,
        max_iters=max_iters, minimum_point_number=minimum_point_number,
        maximum_model_number=maximum_model_number, sampler_id=sampler_id,
        scoring_exponent=scoring_exponent, graph_datas=graphs,
        do_logging=do_logging, random_seed=random_seed,
        n_restarts=n_restarts, mesh=mesh, n_devices=n_devices,
        **engine_kwargs,
    )
    return [(d.reshape(-1, 3).astype(np.float64), l) for d, l in out]


def find6DPosesBatched(
    x1y1_list,
    x2y2z2_list,
    K_list,
    threshold=4.0,
    conf=0.90,
    spatial_coherence_weight=0.1,
    neighborhood_ball_radius=20.0,
    maximum_tanimoto_similarity=0.9,
    max_iters=400,
    minimum_point_number=6,
    maximum_model_number=-1,
    do_logging=False,
    random_seed=0,
    n_restarts=1,
    mesh=None,
    n_devices=None,
    **engine_kwargs,
):
    """Multi 6D-pose fitting over a LIST of scenes in one device batch.
    K_list is one [3,3] per scene OR a single shared [3,3]. Per-scene
    K^-1 normalization and threshold/focal scaling ride into the shared
    program as vmapped runtime values. `engine_kwargs` forwards the
    engine extensions the single-scene front end takes (this front end's
    own defaults: lo_spatial_lambda=0.0, final_polish=3). Returns a list
    of ([3K_i, 4] stacked [R|t], labeling_i)."""
    n_scenes = len(x1y1_list)
    Ks = (list(K_list) if isinstance(K_list, (list, tuple))
          else [K_list] * n_scenes)
    if len(Ks) != n_scenes or len(x2y2z2_list) != n_scenes:
        raise ValueError("x1y1_list, x2y2z2_list, K_list length mismatch")
    datas, graphs, ths = [], [], []
    for x1y1, x2y2z2, K in zip(x1y1_list, x2y2z2_list, Ks):
        x1y1 = np.asarray(x1y1, np.float64)
        x2y2z2 = np.asarray(x2y2z2, np.float64)
        K = np.asarray(K, np.float64)
        if x1y1.ndim != 2 or x1y1.shape[1] != 2 or x1y1.shape[0] < 3:
            raise ValueError(
                "every x1y1 should be an array with dims [n,2], n>=3")
        if x2y2z2.shape != (x1y1.shape[0], 3):
            raise ValueError(
                "every x2y2z2 should be an array with dims [n,3]")
        if K.shape != (3, 3):
            raise ValueError("every K should be an array with dims [3,3]")
        ones = np.ones((x1y1.shape[0], 1))
        norm_xy = (np.concatenate([x1y1, ones], 1) @ np.linalg.inv(K).T)[:, :2]
        datas.append(np.ascontiguousarray(
            np.concatenate([norm_xy, x2y2z2], axis=1), np.float32))
        graphs.append(np.ascontiguousarray(
            np.concatenate([x1y1, x2y2z2], axis=1), np.float32))
        ths.append(threshold / (0.5 * (K[0, 0] + K[1, 1])))
    out = _run_batched(
        "pnp", datas, None,
        thresholds=ths, conf=conf,
        spatial_coherence_weight=spatial_coherence_weight,
        neighborhood_ball_radius=neighborhood_ball_radius,
        maximum_tanimoto_similarity=maximum_tanimoto_similarity,
        max_iters=max_iters, minimum_point_number=minimum_point_number,
        maximum_model_number=maximum_model_number, sampler_id=0,
        scoring_exponent=2, graph_datas=graphs, do_logging=do_logging,
        random_seed=random_seed, n_restarts=n_restarts,
        mesh=mesh, n_devices=n_devices,
        **{"lo_spatial_lambda": 0.0, "final_polish": 3, **engine_kwargs},
    )
    return [(d.reshape(-1, 4).astype(np.float64), l) for d, l in out]
