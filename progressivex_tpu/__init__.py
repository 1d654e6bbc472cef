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

__version__ = "0.3.0"

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache, on by default.

    The fused fit programs take minutes to compile on TPU (the while-loop
    nest plus memory-space assignment dominates); the persistent cache
    brings every repeat invocation — across processes — down to seconds.
    Opt out with PROGX_COMPILE_CACHE=0 (or "off"/"false"/"no"), relocate
    with PROGX_COMPILE_CACHE=<dir>. Registered lazily via jax.config so
    importing this package never initializes a backend.

    Location: a `.jax_cache/` directory next to the package (i.e. at a
    source checkout's repo root) wins over the per-user default — the
    checkout ships PREWARMED cache entries for the benchmark programs, so
    a fresh container's first `python bench.py` loads executables in
    seconds instead of recompiling each for minutes (round 3's driver
    capture timed out on exactly those cold compiles).
    """
    setting = _os.environ.get("PROGX_COMPILE_CACHE", "1")
    if setting.lower() in ("0", "off", "false", "no", "none"):
        return
    if _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        # The user already configured a cache location; an explicit
        # jax.config update would override their env var (config beats
        # env in jax), so the package default must yield.
        return
    if setting not in ("", "1"):
        cache_dir = setting
    else:
        repo_local = _os.path.join(
            _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
            ".jax_cache",
        )
        cache_dir = (
            repo_local
            if _os.path.isdir(repo_local)
            else _os.path.expanduser("~/.cache/progressivex_tpu/jax_cache")
        )
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover — ancient jax without the knobs
        pass


def _set_matmul_precision():
    """Default all matmuls to f32-exact ("highest") on TPU.

    The TPU MXU runs f32 matmuls as bf16 passes under jax's DEFAULT
    precision. Two load-bearing places cannot tolerate that: the kNN
    pairwise distances (ops/knn: |a|^2 + |b|^2 - 2ab with pixel coords up
    to ~1e3 — a bf16 cross term has O(1e3-px^2) absolute error, corrupting
    the radius-gated neighborhood graph and NAPSAC sampling on device
    only), and the solvers' normal-matrix products (A^T A in the 8-point /
    DLT refits). These are a tiny fraction of the engine's FLOPs (the hot
    per-hypothesis scoring pipeline is elementwise; the Potts adjacency
    matmuls are int8 and unaffected), so exactness here is nearly free —
    and it makes device results match the f32 CPU oracle the tests pin.
    Override with PROGX_MATMUL_PRECISION=default|high|highest.
    """
    setting = _os.environ.get("PROGX_MATMUL_PRECISION", "highest")
    if setting in ("", "default"):
        return
    try:
        import jax

        jax.config.update("jax_default_matmul_precision", setting)
    except Exception:  # pragma: no cover — unknown setting / ancient jax
        pass


_enable_compile_cache()
_set_matmul_precision()

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
    from progressivex_tpu.api_batch import (  # noqa: F401
        find6DPosesBatched,
        findEssentialMatricesBatched,
        findHomographiesBatched,
        findLinesBatched,
        findTwoViewMotionsBatched,
        findVanishingPointsBatched,
    )
except ImportError:  # pragma: no cover - only during partial checkouts
    pass
