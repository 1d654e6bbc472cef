"""Full-cardinality protocol test on the synthetic 19+18-scene dataset.

VERDICT r2 missing #1 / next-step #6: the real AdelaideRMF download is
unreachable offline, so the full 19-scene H + 18-scene F bench path
(multi-bucket lane batching, restart flattening, per-scene selection,
chunking) had never executed at true dataset cardinality. The synthetic
stand-in (eval/synth_adelaide.py) matches the real datasets' scene count,
per-scene sizes, structure counts and outlier rates, so this test drives
`eval.adelaide.throughput_batch` — the exact bench entry — end to end at
scale and gates the quality it returns.

Gates are for SYNTHETIC geometry (no real detector noise): they prove the
harness + engine handle 19 distinct scenes across 4+ size buckets, not
parity with the published per-scene MEs.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from progressivex_tpu.eval.adelaide import throughput_batch  # noqa: E402
from progressivex_tpu.eval.synth_adelaide import (  # noqa: E402
    F_SPECS,
    H_SPECS,
    ensure_synth_dataset,
)


def test_full_h_protocol_runs_19_scenes():
    root = ensure_synth_dataset("H")
    r = throughput_batch("H", root=root, n_timing_runs=1, lane_target=1)
    # Every distinct scene must have been batched (lane counts pad to the
    # next power of two per bucket, so the batched total can exceed 19).
    assert r.full_dataset, "synthetic root must be a full dataset"
    assert r.n_scenes >= len(H_SPECS)
    assert r.n_distinct == len(H_SPECS)
    assert np.isfinite(r.scenes_per_sec) and r.scenes_per_sec > 0
    # Synthetic scenes are cleaner than real AdelaideRMF; the protocol
    # should label them well even at dataset scale (hard tail included).
    assert r.mean_me <= 0.08, f"synthetic 19-scene mean ME {r.mean_me:.4f}"


def test_full_f_protocol_runs_18_scenes():
    """The F half of the full-cardinality path (VERDICT r3 item 6): round
    3 gated only H here; the F synthetic sweep ran solely inside the
    bench extras, which timed out and recorded nothing."""
    root = ensure_synth_dataset("F")
    r = throughput_batch("F", root=root, n_timing_runs=1, lane_target=1)
    assert r.full_dataset, "synthetic root must be a full dataset"
    assert r.n_scenes >= len(F_SPECS)
    assert r.n_distinct == len(F_SPECS)
    assert np.isfinite(r.scenes_per_sec) and r.scenes_per_sec > 0
    assert r.mean_me <= 0.08, f"synthetic 18-scene mean ME {r.mean_me:.4f}"
