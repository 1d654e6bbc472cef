"""progressivex_tpu — a TPU-native multi-model fitting framework.

Re-implements the capabilities of Progressive-X (Barath & Matas, ICCV 2019;
reference implementation danini/progressive-x) as batched JAX/XLA/Pallas
programs: batched hypothesis generation replaces sequential RANSAC, a fused
N x B compound-penalized scoring kernel replaces the per-point scoring loop,
and parallel ICM over a k-NN graph replaces gco alpha-expansion — all under
one jit, vmappable over scenes and shardable over a TPU mesh.

Public API mirrors pyprogressivex (`/root/reference/src/pyprogressivex/src/
bindings.cpp:410-491`): findLines, findVanishingPoints, findHomographies,
findTwoViewMotions, find6DPoses — plus findEssentialMatrices (the reference
ships the five-point solver headers but no Python front end for them).
"""

__version__ = "0.2.0"

from progressivex_tpu.models import get_family  # noqa: F401

try:  # The full API needs the core engine; keep import-light during build-up.
    from progressivex_tpu.api import (  # noqa: F401
        find6DPoses,
        findEssentialMatrices,
        findHomographies,
        findLines,
        findTwoViewMotions,
        findVanishingPoints,
    )
except ImportError:  # pragma: no cover - only during partial checkouts
    pass
