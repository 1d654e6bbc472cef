"""Fused Pallas TPU kernel for compound-penalized hypothesis scoring.

The proposal phase's hot tensor is the [B, N] (hypotheses x points)
residual/preference field (reference hot loop:
`scoring_function_with_compound_model.h:61-125`, evaluated point-by-point
per hypothesis). The XLA path (ops/scoring.compound_penalized_scores on a
vmapped residual kernel) materializes the [B, N] squared-residual matrix in
HBM between the residual vmap and the reductions; this kernel fuses
residual construction + truncated/sigma-marginalized preference + all five
reductions into one VMEM-resident pass, so HBM sees only the tiny inputs
(point columns [N, 8], descriptors [D, B], compound preference) and the
[B]-sized outputs.

Layout: the preference field tile is [point_tile, hyp_tile] — point
components are natural [TN, 1] columns of the [N, 8] input, descriptor
components natural [1, TB] rows of the transposed [D, B] descriptor array,
so the outer-product broadcasts hit the VPU with no in-kernel transposes,
and the per-hypothesis reductions run over sublanes into [1, TB] output
blocks.

Grid: (hyp tiles, point tiles); outputs revisit the same block across the
point-tile dimension (their index map ignores it) — the standard Pallas
accumulation pattern.

Supported families: fundamental (Sampson) and homography (transfer error)
— the two benchmark-critical proposal loops.

STATUS (round 5): parity-exact but measured SLOWER than XLA's own fusion
of the same pipeline on both benchmark protocols (F 683 vs 670 ms, H 130
vs 119 ms per batch) — XLA single-passes the VPU-bound pipeline and the
transient [B, N] field is too small for the saved HBM round-trip to
matter. The engine therefore always uses the XLA path (the old
`EngineConfig.pallas_scoring` toggle is retired); this module stays as
the validated template for future hand fusion. Full A/B:
docs/DESIGN_NOTES.md "Pallas scoring kernel".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TB = 256  # hypothesis-tile columns (lane axis; multiple of 128)
_TN = 512  # point-tile rows (sublane axis; multiple of 8)


def _sampson_r2(d, F):
    """Squared Sampson distance field [TN, TB].

    d: point ref block [TN, 8] (cols 0-3 = x1, y1, x2, y2);
    F: descriptor block [16, TB], rows 0-8 = row-major F entries.
    Mirrors models/fundamental._sampson_parts / _squared_residual."""
    p = lambda k: d[:, k:k + 1]  # [TN, 1]
    c = lambda k: F[k:k + 1, :]  # [1, TB]
    x1, y1, x2, y2 = p(0), p(1), p(2), p(3)
    fx0 = c(0) * x1 + c(1) * y1 + c(2)
    fx1 = c(3) * x1 + c(4) * y1 + c(5)
    fx2 = c(6) * x1 + c(7) * y1 + c(8)
    ftx0 = c(0) * x2 + c(3) * y2 + c(6)
    ftx1 = c(1) * x2 + c(4) * y2 + c(7)
    num = x2 * fx0 + y2 * fx1 + fx2
    den = fx0 * fx0 + fx1 * fx1 + ftx0 * ftx0 + ftx1 * ftx1
    return num * num / jnp.maximum(den, 1e-12)


def _homography_r2(d, H):
    """Squared transfer error field [TN, TB] (destination image). Mirrors
    models/homography._squared_residual incl. the plane-at-infinity
    guard."""
    p = lambda k: d[:, k:k + 1]
    c = lambda k: H[k:k + 1, :]
    x1, y1, x2, y2 = p(0), p(1), p(2), p(3)
    px = c(0) * x1 + c(1) * y1 + c(2)
    py = c(3) * x1 + c(4) * y1 + c(5)
    pz = c(6) * x1 + c(7) * y1 + c(8)
    finite = jnp.abs(pz) > 1e-9
    pz_safe = jnp.where(finite, pz, 1e-9)
    dx = px / pz_safe - x2
    dy = py / pz_safe - y2
    r2 = dx * dx + dy * dy
    return jnp.where(finite, r2, jnp.full_like(r2, 1e18))


_RESIDUALS = {"fundamental": _sampson_r2, "homography": _homography_r2}


def _score_kernel(residual_fn, magsac_levels,
                  pts_ref, desc_ref, scal_ref,
                  raw_ref, shared_ref, inl_ref, dot_ref, norm_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        raw_ref[:] = jnp.zeros_like(raw_ref)
        shared_ref[:] = jnp.zeros_like(shared_ref)
        inl_ref[:] = jnp.zeros_like(inl_ref)
        dot_ref[:] = jnp.zeros_like(dot_ref)
        norm_ref[:] = jnp.zeros_like(norm_ref)

    trunc_sq = scal_ref[0, 0]
    d = pts_ref[:]  # [TN, 8]: x1 y1 x2 y2 compound pmask 0 0
    r2 = residual_fn(d, desc_ref[:])  # [TN, TB]
    pm = d[:, 5:6]  # [TN, 1] 0/1 point mask
    comp = d[:, 4:5]  # [TN, 1] compound preference
    x = r2 / trunc_sq
    pref = jnp.maximum(0.0, 1.0 - x) * pm
    if magsac_levels > 0:
        m = float(magsac_levels)
        acc = jnp.zeros_like(x)
        for lev in range(1, magsac_levels + 1):
            s2 = (lev / m) ** 2
            acc = acc + jnp.maximum(0.0, 1.0 - x / s2)
        rank_pref = acc * (pm / m)
    else:
        rank_pref = pref
    raw_ref[:] += jnp.sum(rank_pref, axis=0, keepdims=True)
    shared_ref[:] += jnp.sum(jnp.minimum(pref, comp), axis=0, keepdims=True)
    inl_ref[:] += jnp.sum(
        jnp.where(x < (1.0 / 2.25), pm, jnp.zeros_like(pref)),
        axis=0, keepdims=True)
    dot_ref[:] += jnp.sum(pref * comp, axis=0, keepdims=True)
    norm_ref[:] += jnp.sum(pref * pref, axis=0, keepdims=True)


def fused_scores(family_name, data, descs, compound_pref, point_mask,
                 trunc_sq, exponent, has_compound, magsac_levels=0):
    """Fused scoring: (scores, inliers, pref_dot, pref_sqnorm) [B] each —
    semantically identical to ops/scoring.compound_penalized_scores over
    the family's squared residual.

    data: [N, >=4] f32 (padded; point_mask False on padding rows),
    descs: [B, 9] f32; scalars may be traced values.
    """
    residual_fn = _RESIDUALS[family_name]
    b, n = descs.shape[0], data.shape[0]
    bt = -(-b // _TB) * _TB
    nt = -(-n // _TN) * _TN

    pts = jnp.zeros((nt, 8), jnp.float32)
    pts = pts.at[:n, :4].set(data[:, :4].astype(jnp.float32))
    pts = pts.at[:n, 4].set(compound_pref.astype(jnp.float32))
    pts = pts.at[:n, 5].set(point_mask.astype(jnp.float32))
    descsT = jnp.zeros((16, bt), jnp.float32)
    descsT = descsT.at[:9, :b].set(descs.astype(jnp.float32).T)
    scal = jnp.asarray(trunc_sq, jnp.float32).reshape(1, 1)

    n_bt, n_nt = bt // _TB, nt // _TN
    out_shape = [jax.ShapeDtypeStruct((1, bt), jnp.float32)] * 5
    out_spec = pl.BlockSpec((1, _TB), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    raw, shared, inl, dot, norm = pl.pallas_call(
        functools.partial(_score_kernel, residual_fn, int(magsac_levels)),
        grid=(n_bt, n_nt),
        # Interpreter mode off-TPU so the CPU test suite can exercise the
        # kernel's semantics.
        interpret=jax.default_backend() != "tpu",
        in_specs=[
            pl.BlockSpec((_TN, 8), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, _TB), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[out_spec] * 5,
        out_shape=out_shape,
    )(pts, descsT, scal)

    raw = raw[0, :b]
    shared = shared[0, :b]
    inliers = jnp.round(inl[0, :b]).astype(jnp.int32)
    dots = dot[0, :b]
    norms = norm[0, :b]
    penalty = jnp.power(jnp.maximum(shared, 0.0), exponent)
    scores = jnp.where(has_compound, raw - penalty, raw)
    return scores, inliers, dots, norms


def supported(family_name: str) -> bool:
    return family_name in _RESIDUALS
