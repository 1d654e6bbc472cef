"""Device-time phase attribution via jax.profiler traces.

The reference's IterationStatistics records wall-clock per phase
(`progressive_x.h:75-104`: proposal / validation / optimization times).
Inside one fused XLA program phases overlap and fuse, so there is no
in-program clock to read; instead the engine tags its phases with
`jax.named_scope` (progx_proposal / progx_sampling / progx_graph /
progx_labeling / progx_refit — see core/engine.py, core/pearl.py), the
tags flow into HLO op metadata, and this module runs ONE profiled
execution and rolls the trace's XLA-op self-times up by tag.

Attribution caveat (inherent, documented in Statistics): XLA fuses ops
across scope boundaries and a fusion carries one representative name, so
a fused elementwise chain spanning proposal->validation lands in whichever
scope named the fusion root. The numbers answer "which phase dominates",
not "exact microseconds per phase".
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import tempfile
from collections import defaultdict

DEFAULT_SCOPES = ("progx_proposal", "progx_sampling", "progx_graph",
                  "progx_labeling", "progx_refit")


def op_self_times(trace_dir: str):
    """Parse the newest trace under `trace_dir` into XLA-op self-times.

    Returns a list of (match_text, self_time_us) where match_text
    concatenates the event name with every string arg (fusion metadata
    carries the jax named_scope path in args) — callers substring-match
    phase tags against it. Container ops (while/conditional bodies) emit
    INCLUSIVE durations covering their children on the same track, so a
    per-track stack sweep subtracts directly-nested child spans first.
    """
    traces = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not traces:
        return []
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    ops_tids = set()
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            if "XLA Ops" in e.get("args", {}).get("name", ""):
                ops_tids.add((e.get("pid"), e.get("tid")))
    by_track = defaultdict(list)
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in ops_tids:
            args = e.get("args", {}) or {}
            meta = " ".join(str(v) for v in args.values()
                            if isinstance(v, str))
            by_track[(e["pid"], e["tid"])].append(
                (e["ts"], e["ts"] + e.get("dur", 0.0),
                 f"{e['name']} {meta}", e.get("dur", 0.0)))
    out = []
    for evs in by_track.values():
        evs.sort(key=lambda x: (x[0], -x[1]))
        stack = []  # (end_ts, index into selfs)
        selfs = []
        for ts, te, text, dur in evs:
            while stack and stack[-1][0] <= ts:
                stack.pop()
            if stack:
                selfs[stack[-1][1]][1] -= dur
            selfs.append([text, dur])
            stack.append((te, len(selfs) - 1))
        out.extend((t, max(d, 0.0)) for t, d in selfs)
    return out


def measure_phase_times(run_once, scopes=DEFAULT_SCOPES,
                        trace_dir: str | None = None):
    """Profile ONE execution of `run_once` and attribute device time.

    Returns {"<scope>_ms": float, ..., "other_ms": float,
    "total_device_ms": float} or None when the backend produced no XLA-op
    trace (e.g. platforms without profiler support)."""
    import jax

    tmp = trace_dir or tempfile.mkdtemp(prefix="progx_phase_")
    try:
        with jax.profiler.trace(tmp):
            run_once()
    except Exception:  # noqa: BLE001 — profiler unsupported on backend
        return None
    ops = op_self_times(tmp)
    if not ops:
        return None
    per = {s: 0.0 for s in scopes}
    other = 0.0
    total = 0.0
    for text, dur in ops:
        total += dur
        for s in scopes:
            if s in text:
                per[s] += dur
                break
        else:
            other += dur
    out = {f"{s}_ms": round(v / 1e3, 3) for s, v in per.items()}
    out["other_ms"] = round(other / 1e3, 3)
    out["total_device_ms"] = round(total / 1e3, 3)
    return out
