"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
xla_force_host_platform_device_count per the TPU-first test strategy.
Must run before the first `import jax` anywhere in the test process.
"""

import os
import resource

# XLA:CPU codegen of the big fused fit programs recurses deeply in LLVM;
# with the default 8 MB stack a long single-process test session can
# segfault inside backend_compile_and_load (observed: full-suite run
# crashed in test_batch_mesh after ~19 green tests, while the same file
# passes in a fresh process). Raise the soft stack limit toward the hard
# limit before any jax import.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 * 1024 * 1024
if _soft != resource.RLIM_INFINITY and (_hard == resource.RLIM_INFINITY
                                        or _hard >= _want):
    try:
        resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
    except (ValueError, OSError):  # pragma: no cover — locked-down hosts
        pass

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Persistent compilation cache: the solver tests compile many small
# svd/eigh programs; caching cuts re-runs from minutes to seconds.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/progx_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

# The image's sitecustomize force-registers the remote "axon" TPU backend
# with priority over the env var; config.update is the effective override.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

_last_module = [None]


@pytest.fixture(autouse=True)
def _clear_jax_caches_between_modules(request):
    """Drop jax's in-process executable/tracing caches at module
    boundaries. A single long pytest session accumulates dozens of large
    XLA:CPU executables, after which a LATER compile reproducibly
    segfaults inside backend_compile_and_load (observed at two different
    tests depending on ordering; the same tests pass in a fresh process,
    512 MB stack did not help — an upstream compiler-state bug).
    Re-compiles across modules are cheap here: the persistent disk cache
    above serves them in seconds."""
    mod = request.node.nodeid.split("::", 1)[0]
    if _last_module[0] is not None and _last_module[0] != mod:
        jax.clear_caches()
        import gc

        gc.collect()  # release dropped executables' LLVM state promptly
    _last_module[0] = mod
    yield
