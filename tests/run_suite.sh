#!/bin/sh
# Full-suite runner: one pytest PROCESS per test file.
#
# Why not one `pytest tests/`? XLA:CPU's in-process compiler state
# degrades over a long session: after ~50 tests' worth of large fused
# executables a later compile segfaults inside backend_compile_and_load
# (observed round 4 at two different tests depending on ordering, and
# round 5 at test_gauntlet_three_motions ~2 h in, WITH the conftest's
# module-boundary jax.clear_caches workaround). Every file passes in a
# fresh process; this script is the supported way to run everything.
# The persistent compile cache (conftest: /tmp/progx_jax_cache) makes
# the per-process restarts cheap.
#
# Usage:
#   sh tests/run_suite.sh            # everything, including slow tests
#   sh tests/run_suite.sh -m 'not slow'   # extra args pass through
set -u
cd "$(dirname "$0")/.."
rc=0
for f in tests/test_*.py; do
    echo "=== $f"
    python -m pytest "$f" -q "$@"
    frc=$?
    # 5 = "no tests ran" (a file whose tests are all deselected by -m) —
    # not a failure for a per-file sweep.
    [ "$frc" -ne 0 ] && [ "$frc" -ne 5 ] && rc=$frc
done
exit $rc
