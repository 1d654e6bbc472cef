"""Model-family plugin interface.

A family bundles (data layout, minimal solver, non-minimal weighted solver,
residual, descriptor shape) — the TPU-native analog of the reference's
Estimator concept (`/root/reference/src/pyprogressivex/include/
vanishing_point_estimator.h:86-224`): sampleSize / nonMinimalSampleSize /
estimateModel / estimateModelNonminimal / squaredResidual.

Unlike the reference (virtual calls, one point at a time), every function
here is written for a SINGLE problem with static shapes and gets batched by
the engine via `jax.vmap`:

  minimal_solver(samples [sample_size, data_dim])
      -> (descs [max_solutions, desc_dim], valid [max_solutions] bool)
  nonminimal_solver(data [N, data_dim], weights [N])
      -> (desc [desc_dim], valid bool)
  squared_residual(data [N, data_dim], desc [desc_dim]) -> [N]
  refine_solver(data [N, data_dim], weights [N], init_desc [desc_dim])
      -> (desc [desc_dim], valid bool)   [optional]

`refine_solver` is a warm-started non-minimal fit (e.g. Gauss-Newton on the
true geometric residual). When present, the engine's local-optimization and
PEARL refit steps prefer it over the from-scratch `nonminimal_solver`: both
call sites always hold a current descriptor, and for some geometries
(notably PnP under weak perspective, where the algebraic DLT objective is
nearly degenerate) minimizing the true reprojection error from a warm start
is dramatically more accurate than any closed-form algebraic fit.

Descriptors are flat f32/f64 vectors so the engine can store the compound
model as one dense [K_max, desc_dim] array.
"""

from __future__ import annotations

import dataclasses
from typing import Callable


@dataclasses.dataclass(frozen=True)
class ModelFamily:
    name: str
    data_dim: int  # columns of one data row
    sample_size: int  # minimal sample size (reference: Estimator::sampleSize)
    nonminimal_min: int  # min points for a non-minimal refit
    max_solutions: int  # max models returned by the minimal solver
    desc_dim: int  # flattened descriptor length
    desc_shape: tuple  # output shape of one descriptor, e.g. (3, 3)
    minimal_solver: Callable
    nonminimal_solver: Callable
    squared_residual: Callable
    refine_solver: Callable | None = None
    minimal_solver_batched: Callable | None = None
    # Optional hand-batched minimal solver ([B, m, d] -> ([B, S, D],
    # [B, S])). When present, the engine uses it instead of
    # vmap(minimal_solver): solvers built on tiny unrolled eliminations
    # should keep the hypothesis batch on the vector lanes (see
    # ops/linalg.gauss_jordan_solve_lanes), which vmap's batch-leading
    # layout cannot express.

    def refit(self, data, weights, init_desc):
        """Warm-started non-minimal fit: refine_solver when the family has
        one, else the stateless nonminimal_solver."""
        if self.refine_solver is not None:
            return self.refine_solver(data, weights, init_desc)
        return self.nonminimal_solver(data, weights)

    def __hash__(self):  # usable as a static jit argument
        return hash(self.name)

    def __eq__(self, other):
        return isinstance(other, ModelFamily) and other.name == self.name


_REGISTRY: dict = {}


def register_family(family: ModelFamily) -> ModelFamily:
    _REGISTRY[family.name] = family
    return family


def get_family(name: str) -> ModelFamily:
    # Import lazily so `get_family` works regardless of import order.
    if not _REGISTRY:
        from progressivex_tpu import models as _m  # noqa: F401
    return _REGISTRY[name]
