"""Benchmark: AdelaideRMF multi-model throughput on one TPU chip.

Protocols mirror the reference notebooks
(`dataset_comparison/adelaideH.ipynb` / `adelaideF.ipynb`, SURVEY.md §6):
findHomographies / findTwoViewMotions with the notebook kwargs, run on the
full downloaded AdelaideRMF datasets when reachable, else on the bundled
ground-truth scenes (a loud fallback — see progressivex_tpu/eval/adelaide).

Metric: scenes/second, steady-state, scene-batched (the TPU-native way to
run a dataset: one vmapped device program over padded scenes).
Baselines (reference CPU, BASELINE.md): H 0.077 s/scene ≈ 13 scenes/s at
mean ME 0.064; F 0.654 s/scene ≈ 1.5 scenes/s at mean ME 0.109.
Extra phases cover the rest of the capability surface: T-LESS 6D pose,
2D lines (ref 0.709 s / 7 models), vanishing points (ref 0.0048 s /
3 VPs), the essential-matrix gauntlet, and a synthetic full-cardinality
19+18-scene sweep.

Robustness (VERDICT r4 item 1 — rounds 3/4 produced no parsed record):
  * the tunneled TPU backend's init can transiently fail (round 4 died on
    `UNAVAILABLE` before any output) — bench probes the backend in a
    SUBPROCESS with retry/backoff before touching jax in-process, so a
    flaky minute never poisons this process's backend state,
  * the JSON line prints UNCONDITIONALLY in a `finally` — `out` is seeded
    with the metric skeleton before any phase, so even a total failure
    emits a parseable record carrying an `error` field,
  * a SIGALRM watchdog fires past the budget and a SIGTERM handler
    converts a driver `timeout` into SystemExit: both paths reach the
    `finally`,
  * every phase runs through the SAME AOT-compiled programs, served from
    the persistent compile cache — the checkout ships `.jax_cache/` with
    prewarmed entries so a fresh container loads executables in seconds
    instead of recompiling for minutes (what timed out round 3),
  * a wall-clock budget (PROGX_BENCH_BUDGET_S, default 900 s) skips
    remaining extras once exceeded; each extra is exception-isolated.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import signal
import subprocess
import sys
import time

T0 = time.perf_counter()
# 1800 s: program-load cost through the tunneled backend varies ~5x day
# to day (warm AOT loads measured 166-410 s/program on a slow day vs
# tens of seconds on a fast one). The budget self-bounds the extras; a
# tighter EXTERNAL driver timeout is also safe — its SIGTERM lands in
# the finally and the JSON still carries every completed phase.
BUDGET_S = float(os.environ.get("PROGX_BENCH_BUDGET_S", "1800"))

# TPU v5e (v5 lite) peaks, for the utilization fields: 197 TFLOP/s bf16
# MXU, ~819 GB/s HBM. The engine's hot path is fused elementwise scoring
# (VPU) + int8/f32 matmuls, so FLOP utilization vs the bf16 MXU peak is
# structurally small — the HBM fraction is the binding roofline axis.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_HBM_BYTES_PER_S = 819e9


def elapsed():
    return time.perf_counter() - T0


def _on_term(signum, frame):
    raise SystemExit(124)


def _on_alarm(signum, frame):
    raise SystemExit(125)


def _probe_backend(out):
    """Probe TPU backend health in a SUBPROCESS with retry/backoff.

    Round 4's capture died on `RuntimeError: Unable to initialize backend
    'axon': UNAVAILABLE` — a transient tunnel failure. jax caches backend
    -init errors for the life of the process, so the retry must happen
    OUTSIDE this process: probe `jax.devices()` in a child until it
    succeeds, then (and only then) initialize jax here. Returns True when
    the backend answered; False (with out["error"] set) after ~4 minutes
    of failures — the caller still emits the JSON skeleton."""
    last = ""
    for i, delay in enumerate((0, 5, 10, 20, 45, 60, 60)):
        if delay:
            print(f"[bench] backend probe retry {i} in {delay}s: {last}",
                  file=sys.stderr)
            time.sleep(delay)
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import jax; print(len(jax.devices()))"],
                capture_output=True, text=True, timeout=180)
            if r.returncode == 0:
                out["n_devices"] = int(r.stdout.strip().splitlines()[-1])
                out["backend_probe_attempts"] = i + 1
                return True
            last = (r.stderr or "").strip().splitlines()[-1:] or ["?"]
            last = last[0][-200:]
        except Exception as e:  # noqa: BLE001 — incl. probe timeout
            last = f"{type(e).__name__}: {e}"
    out["error"] = f"TPU backend unavailable after retries: {last}"
    return False


def main():
    # Parseable skeleton FIRST: any failure path still prints a record
    # with the driver's expected fields present (value null signals "no
    # measurement", error says why).
    out = {"metric": "adelaideH_scenes_per_sec", "value": None,
           "unit": "scenes/s", "vs_baseline": None}
    signal.signal(signal.SIGTERM, _on_term)
    signal.signal(signal.SIGALRM, _on_alarm)
    # Watchdog: a tunnel stall inside one jax call can hang past any
    # budget check (measured: a cached 1 s program once stalled > 300 s).
    # The alarm forces the finally; the driver's own SIGTERM also lands
    # in the finally via _on_term.
    signal.alarm(int(BUDGET_S + 240))
    try:
        if _probe_backend(out):
            run_phases(out)
    except BaseException as e:  # noqa: BLE001 — record, then re-raise
        out.setdefault("error", f"{type(e).__name__}: {e}"[:300])
        raise
    finally:
        out["bench_wall_s"] = round(elapsed(), 1)
        print(json.dumps(out), flush=True)


def run_phases(out):
    from progressivex_tpu.eval.adelaide import throughput_all

    results, compile_s = throughput_all("HF")
    rh, rf = results["H"], results["F"]
    print(
        f"H: {rh.scenes_per_sec:.2f} scenes/s ME={rh.mean_me:.4f} "
        f"(batch={rh.n_scenes}, full_dataset={rh.full_dataset}, "
        f"pass={rh.pass_seconds * 1e3:.1f}ms/{rh.n_distinct} scenes)\n"
        f"F: {rf.scenes_per_sec:.2f} scenes/s ME={rf.mean_me:.4f} "
        f"(batch={rf.n_scenes}, full_dataset={rf.full_dataset}, "
        f"pass={rf.pass_seconds * 1e3:.1f}ms/{rf.n_distinct} scenes)\n"
        f"compile (all programs, sequential): {compile_s:.1f}s",
        file=sys.stderr,
    )

    # Reference MEs on the SAME scenes (saved notebook outputs): full
    # datasets -> the published means; bundled fallback -> the reference's
    # per-scene values for exactly those scenes (adelaideH.ipynb:
    # oldclassicswing 0.005, unionhouse 0.006, unihouse 0.186;
    # adelaideF.ipynb: book 0.032, breadcube 0.017, cubetoy 0.012).
    h_ref = 0.064 if rh.full_dataset else round((0.005 + 0.006 + 0.186) / 3, 4)
    f_ref = 0.109 if rf.full_dataset else round((0.032 + 0.017 + 0.012) / 3, 4)
    out.update({
        "metric": "adelaideH_scenes_per_sec",
        "value": round(rh.scenes_per_sec, 3),
        "unit": "scenes/s",
        "vs_baseline": round(rh.scenes_per_sec / 13.0, 3),
        "mean_misclassification": round(rh.mean_me, 4),
        "baseline_misclassification_same_scenes": h_ref,
        "n_scenes_batched": rh.n_scenes,
        "full_dataset_H": rh.full_dataset,
        "adelaideF_scenes_per_sec": round(rf.scenes_per_sec, 3),
        "adelaideF_vs_baseline": round(rf.scenes_per_sec / 1.5, 3),
        "adelaideF_mean_misclassification": round(rf.mean_me, 4),
        "adelaideF_baseline_misclassification_same_scenes": f_ref,
        "adelaideF_n_scenes_batched": rf.n_scenes,
        "full_dataset_F": rf.full_dataset,
        # Protocol disclosure (VERDICT r3 weak #7): the F bench runs the
        # measured quality-neutral knee (eval/adelaide.F_PROTOCOL), not
        # the reference's hard caps; API defaults keep reference parity.
        "adelaideF_protocol": "max_rounds=6,pearl_iters=2 knee; reference "
                              "10x3 caps measure 45.5 scenes/s at ME 0.0186",
        # One pass over the distinct scenes through the same executables
        # (reference notebooks' per-scene runtime sum).
        "adelaideH_dataset_seconds": round(rh.pass_seconds, 4),
        "adelaideH_dataset_n_scenes": rh.n_distinct,
        "adelaideF_dataset_seconds": round(rf.pass_seconds, 4),
        "adelaideF_dataset_n_scenes": rf.n_distinct,
        "compile_seconds_all_programs": round(compile_s, 1),
    })

    # Device-utilization fields (VERDICT r4 item 2): XLA cost analysis of
    # the AOT-compiled protocol programs (FLOPs / bytes accessed per batch
    # execution) over the measured best batch wall time. Wall ≈ device for
    # these 100s-of-ms batches (one dispatch). Caveat carried in the
    # *_note field: XLA counts `while` bodies (the outer proposal rounds)
    # at ONE trip, so FLOPs/bytes are lower bounds — utilization fractions
    # are conservative.
    for prob, r in (("H", rh), ("F", rf)):
        flops = sum(b.get("flops", 0.0) for b in r.buckets)
        nbytes = sum(b.get("bytes_accessed", 0.0) for b in r.buckets)
        t = sum(b["best_s"] for b in r.buckets)
        if flops and t:
            out[f"adelaide{prob}_device_ms_per_batch"] = [
                round(b["best_s"] * 1e3, 1) for b in r.buckets]
            out[f"adelaide{prob}_achieved_tflops"] = round(
                flops / t / 1e12, 3)
            out[f"adelaide{prob}_mfu_vs_v5e_bf16_peak"] = round(
                flops / t / V5E_PEAK_BF16_FLOPS, 4)
            out[f"adelaide{prob}_hbm_gb_per_s"] = round(
                nbytes / t / 1e9, 1)
            out[f"adelaide{prob}_hbm_utilization"] = round(
                nbytes / t / V5E_HBM_BYTES_PER_S, 3)
    out["utilization_note"] = (
        "XLA cost analysis counts while-loop bodies once; FLOP/byte "
        "figures are per-batch lower bounds (outer proposal rounds "
        "iterate up to max_rounds times)")

    # T-LESS multi-6D-pose quality + runtime (reference anchors from the
    # demo outputs, cpp_example.cpp:406-438 / example_multi_pose_6d.ipynb:
    # rot 8.25/0.95 deg, transl 24.0/12.2 mm, 57.57 s on the ref CPU).
    import numpy as np

    from progressivex_tpu import find6DPoses
    from progressivex_tpu.io.data import load_tless_scene
    from progressivex_tpu.io.metrics import pose_errors

    xy, xyz, K, gt_poses = load_tless_scene()
    kw = dict(threshold=4.0, conf=0.9, spatial_coherence_weight=0.1,
              neighborhood_ball_radius=20.0, maximum_tanimoto_similarity=0.9,
              max_iters=400, minimum_point_number=6)
    find6DPoses(xy, xyz, K, **kw, random_seed=0)  # warm the program
    # 3 seeds: a randomized multi-instance fit's per-seed errors spread
    # (measured 5.7-9.4 deg on pose-0); the mean is the fair comparison
    # against the reference's single recorded run, and the per-seed
    # values are reported alongside so nothing hides in the average.
    per_seed = []
    pose_time = None
    for seed in (1, 2, 3):
        t0 = time.perf_counter()
        poses, labeling = find6DPoses(xy, xyz, K, **kw, random_seed=seed)
        pose_time = pose_time or (time.perf_counter() - t0)
        k = poses.shape[0] // 3
        per_seed.append(pose_errors(
            [poses[3 * i:3 * i + 3] for i in range(k)], gt_poses))
    a = np.array(per_seed)  # [seed, gt_pose, (rot, tr)]
    rot_errs = [round(float(v), 3) for v in a[:, :, 0].mean(0)]
    tr_errs = [round(float(v), 3) for v in a[:, :, 1].mean(0)]
    print(
        f"T-LESS 6D pose (mean of seeds 1-3): rot errs {rot_errs} deg "
        f"(ref 8.25/0.95), transl errs {tr_errs} mm (ref 24.0/12.2), "
        f"{pose_time:.3f}s/run; per-seed rot "
        f"{[[round(float(r), 2) for r, _ in s] for s in per_seed]}",
        file=sys.stderr,
    )
    out.update({
        "tless_rotation_errors_deg": rot_errs,
        "tless_translation_errors_mm": tr_errs,
        "tless_rotation_errors_per_seed":
            [[round(float(r), 3) for r, _ in s] for s in per_seed],
        "tless_translation_errors_per_seed":
            [[round(float(t), 3) for _, t in s] for s in per_seed],
        "tless_n_seeds": 3,
        "tless_ref_rotation_errors_deg": [8.25, 0.95],
        "tless_ref_translation_errors_mm": [24.0, 12.2],
        "tless_time_s": round(pose_time, 3),
        "tless_ref_time_s": 57.57,
    })

    # --- Budget-gated extras, most valuable first; each isolated. -------
    if os.environ.get("PROGX_BENCH_EXTRAS", "1") == "0":
        return

    def extra(name, fn, cost_guess_s):
        """Run one extra phase if the budget allows; never eat the JSON."""
        if elapsed() + cost_guess_s > BUDGET_S:
            print(f"[bench] skipping {name}: {elapsed():.0f}s + ~"
                  f"{cost_guess_s:.0f}s > budget {BUDGET_S:.0f}s",
                  file=sys.stderr)
            return
        try:
            t0 = time.perf_counter()
            out.update(fn())
            print(f"[bench] {name} done in {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — extras must never kill it
            print(f"[bench] WARNING: {name} failed: "
                  f"{type(e).__name__}: {e}", file=sys.stderr)
            out[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]

    # Lines / VPs / essential gauntlet (VERDICT r4 item 3). Cost guesses
    # are warm-cache figures + margin; cold compiles instead hit the
    # budget gate on whatever runs after them.
    from progressivex_tpu.eval.extras import (
        bench_essential, bench_lines, bench_vps)

    extra("lines", bench_lines, 180)
    extra("vp", bench_vps, 150)
    extra("essential", bench_essential, 120)

    # Synthetic full-cardinality 19 H + 18 F sweep (eval/synth_adelaide):
    # full-dataset-scale evidence for the multi-bucket harness, run
    # through the bundled phase's EXECUTABLES (allowed_buckets) — the only
    # possible new program is the F 384-point bucket. MEs on synthetic
    # geometry are NOT comparable to the published per-scene numbers;
    # they gate harness correctness at scale.
    def synth():
        from progressivex_tpu.eval.adelaide import throughput_batch
        from progressivex_tpu.eval.synth_adelaide import ensure_synth_dataset

        fields = {}
        for prob, res in (("H", rh), ("F", rf)):
            if elapsed() > BUDGET_S:
                print(f"[bench] skipping synth {prob}: over budget",
                      file=sys.stderr)
                break
            allowed = {b["n_pad"] for b in res.buckets}
            s = throughput_batch(prob, root=ensure_synth_dataset(prob),
                                 n_timing_runs=1, allowed_buckets=allowed)
            print(
                f"synthetic full-cardinality {prob}: {s.n_distinct} scenes "
                f"ME={s.mean_me:.4f} pass={s.pass_seconds * 1e3:.1f}ms "
                f"(extra compile {s.compile_seconds:.1f}s)",
                file=sys.stderr,
            )
            card = {"H": 19, "F": 18}[prob]
            fields.update({
                f"synth{card}{prob}_n_scenes": s.n_distinct,
                f"synth{card}{prob}_mean_misclassification":
                    round(s.mean_me, 4),
                f"synth{card}{prob}_dataset_seconds":
                    round(s.pass_seconds, 4),
                f"synth{card}{prob}_compile_seconds":
                    round(s.compile_seconds, 1),
            })
        return fields

    extra("synth_sweep", synth, 300)


if __name__ == "__main__":
    main()
