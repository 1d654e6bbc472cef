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

Structure (VERDICT r3 item 1 — round 3's JSON never printed because the
extras compiled ~10 fresh programs after the main phase and the driver
timed the script out):
  * every phase — throughput, dataset pass, the synthetic 19+18-scene
    sweep — runs through the SAME compiled programs (the dataset pass is
    derived from the throughput timing; the synthetic sweep pads its
    scenes into the bundled phase's buckets via `allowed_buckets`),
  * the JSON line is printed in a `finally`: a crash or overrun in a
    late phase degrades the extras fields instead of losing the record,
  * a wall-clock budget (PROGX_BENCH_BUDGET_S, default 720 s) skips
    remaining extras once exceeded.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import os
import signal
import sys
import time

T0 = time.perf_counter()
# Self-skip extras before any external driver timeout. The tunneled
# compile service's LOAD variance is large (the same cached program
# measured 53 s and 386 s across back-to-back runs), so the budget is
# generous rather than tight: a driver-side `timeout` SIGTERM is
# converted to SystemExit by the handler below, which runs the `finally`
# and prints the JSON with every field computed so far — the record
# degrades by at most the synthetic-sweep extras, never to nothing.
BUDGET_S = float(os.environ.get("PROGX_BENCH_BUDGET_S", "900"))


def elapsed():
    return time.perf_counter() - T0


def _on_term(signum, frame):
    raise SystemExit(124)


def main():
    out = {}
    signal.signal(signal.SIGTERM, _on_term)
    try:
        run_phases(out)
    finally:
        if out:
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

    # Synthetic full-cardinality 19 H + 18 F sweep (eval/synth_adelaide):
    # full-dataset-scale evidence for the multi-bucket harness, run
    # through the bundled phase's EXECUTABLES (allowed_buckets) — the only
    # possible new program is the F 384-point bucket (bundled F scenes
    # are all <= 256 points, the synthetic dataset matches the real F
    # scenes' 150-600 range). MEs on synthetic geometry are NOT
    # comparable to the published per-scene numbers; they gate harness
    # correctness at scale.
    if os.environ.get("PROGX_BENCH_EXTRAS", "1") == "0":
        return
    if elapsed() > BUDGET_S:
        print(f"[bench] skipping synthetic sweep: {elapsed():.0f}s "
              f"> budget {BUDGET_S:.0f}s", file=sys.stderr)
        return
    try:
        from progressivex_tpu.eval.adelaide import throughput_batch
        from progressivex_tpu.eval.synth_adelaide import ensure_synth_dataset

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
            out.update({
                f"synth{card}{prob}_n_scenes": s.n_distinct,
                f"synth{card}{prob}_mean_misclassification":
                    round(s.mean_me, 4),
                f"synth{card}{prob}_dataset_seconds":
                    round(s.pass_seconds, 4),
                f"synth{card}{prob}_compile_seconds":
                    round(s.compile_seconds, 1),
            })
    except Exception as e:  # noqa: BLE001 — extras must never eat the JSON
        print(f"[bench] WARNING: synthetic sweep failed: "
              f"{type(e).__name__}: {e}", file=sys.stderr)
        out["synth_sweep_error"] = f"{type(e).__name__}: {e}"


if __name__ == "__main__":
    main()
