"""Multi-chip scaling over a TPU mesh.

The reference is a single-threaded CPU library (SURVEY.md §2.4 — no
distributed anything); the TPU-native scaling axes are:

  * SCENE parallelism ("data parallel"): independent scenes shard across
    the `scenes` mesh axis — pure SPMD, zero communication. This is how the
    AdelaideRMF throughput benchmark scales across a pod slice.
  * HYPOTHESIS parallelism: for one huge scene, each device along the
    `hyp` mesh axis draws its own batch of minimal samples and scores it
    against its replica of the points; the winning proposal is reduced with
    one tiny all-gather per round (engine.py `_proposal`). This multiplies
    the per-round hypothesis budget by the axis size.

Both compose on a 2D mesh ("scenes", "hyp"), built here with shard_map so
the collectives ride ICI and XLA sees the full SPMD program.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from progressivex_tpu.core import engine
from progressivex_tpu.core.config import EngineConfig, RuntimeParams
from progressivex_tpu.models.base import ModelFamily, get_family


def make_mesh(n_scenes_axis: int, n_hyp_axis: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = n_scenes_axis * n_hyp_axis
    if devices.size < n:
        raise ValueError(f"need {n} devices, have {devices.size}")
    grid = devices[:n].reshape(n_scenes_axis, n_hyp_axis)
    return Mesh(grid, ("scenes", "hyp"))


def fit_batch(
    family: ModelFamily | str,
    cfg: EngineConfig,
    params: RuntimeParams,
    data,  # [S, N, d]
    point_mask,  # [S, N]
    point_weights,  # [S, N]
    keys,  # [S, 2] uint32 PRNG keys
    mesh: Mesh | None = None,
):
    """Fit a batch of scenes; optionally sharded over a ("scenes","hyp") mesh.

    Without a mesh this is jit(vmap(fit)) on the current default device —
    the single-chip throughput path. With a mesh, scenes shard across the
    `scenes` axis and every scene's hypothesis budget multiplies by the
    `hyp` axis size.
    """
    if isinstance(family, str):
        family = get_family(family)

    if mesh is None:
        run = jax.jit(
            jax.vmap(
                lambda d, m, w, k: engine.fit(family, cfg, params, d, m, w, k)
            )
        )
        return run(data, point_mask, point_weights, keys)

    cfg_sharded = dataclasses.replace(cfg, hyp_axis="hyp")

    def per_device(data, mask, weights, keys):
        return jax.vmap(
            lambda d, m, w, k: engine.fit(family, cfg_sharded, params, d, m, w, k)
        )(data, mask, weights, keys)

    spec = P("scenes")
    run = jax.jit(
        jax.shard_map(
            per_device,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec),
            # Single-spec prefix: every FitResult leaf (incl. the RoundLog
            # subtree) shards along the scenes axis.
            out_specs=spec,
            # The scan carry starts replicated (zeros) and becomes varying
            # after the first axis_index fold; skip the static VMA check.
            check_vma=False,
        )
    )
    return run(data, point_mask, point_weights, keys)
