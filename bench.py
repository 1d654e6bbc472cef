"""Benchmark: AdelaideRMF multi-model throughput on one TPU chip.

Protocols mirror the reference notebooks exactly
(`dataset_comparison/adelaideH.ipynb` / `adelaideF.ipynb`, SURVEY.md §6):
findHomographies / findTwoViewMotions with the notebook kwargs, run on the
full downloaded AdelaideRMF datasets when reachable, else on the bundled
ground-truth scenes (a loud fallback — see progressivex_tpu/eval/adelaide).

Metric: scenes/second, steady-state, scene-batched (the TPU-native way to
run a dataset: one vmapped device program over padded scenes).
Baselines (reference CPU, BASELINE.md): H 0.077 s/scene ≈ 13 scenes/s at
mean ME 0.064; F 0.654 s/scene ≈ 1.5 scenes/s at mean ME 0.109.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.
"""

import json
import sys


def main():
    from progressivex_tpu.eval.adelaide import throughput_all

    results, compile_s = throughput_all("HF")
    h_sps, h_me, h_n, h_full, _ = results["H"]
    f_sps, f_me, f_n, f_full, _ = results["F"]
    print(
        f"H: {h_sps:.2f} scenes/s ME={h_me:.4f} "
        f"(batch={h_n}, full_dataset={h_full})\n"
        f"F: {f_sps:.2f} scenes/s ME={f_me:.4f} "
        f"(batch={f_n}, full_dataset={f_full})\n"
        f"compile (all programs, sequential): {compile_s:.1f}s",
        file=sys.stderr,
    )
    h_compile = f_compile = compile_s

    # T-LESS multi-6D-pose quality + runtime (reference anchors from the
    # demo outputs, cpp_example.cpp:406-438 / example_multi_pose_6d.ipynb:
    # rot 8.25/0.95 deg, transl 24.0/12.2 mm, 57.57 s on the ref CPU).
    import time

    import numpy as np

    from progressivex_tpu import find6DPoses
    from progressivex_tpu.io.data import load_tless_scene
    from progressivex_tpu.io.metrics import pose_errors

    xy, xyz, K, gt_poses = load_tless_scene()
    kw = dict(threshold=4.0, conf=0.9, spatial_coherence_weight=0.1,
              neighborhood_ball_radius=20.0, maximum_tanimoto_similarity=0.9,
              max_iters=400, minimum_point_number=6)
    find6DPoses(xy, xyz, K, **kw, random_seed=0)  # warm the program
    t0 = time.perf_counter()
    poses, labeling = find6DPoses(xy, xyz, K, **kw, random_seed=1)
    pose_time = time.perf_counter() - t0
    k = poses.shape[0] // 3
    errs = pose_errors([poses[3 * i:3 * i + 3] for i in range(k)], gt_poses)
    rot_errs = [round(float(r), 3) for r, _ in errs]
    tr_errs = [round(float(t), 3) for _, t in errs]
    print(
        f"T-LESS 6D pose: {k} instances in {pose_time:.3f}s, "
        f"rot errs {rot_errs} deg (ref 8.25/0.95), "
        f"transl errs {tr_errs} mm (ref 24.0/12.2)",
        file=sys.stderr,
    )

    # Extras (skippable with PROGX_BENCH_EXTRAS=0):
    #  * unique-dataset pass seconds — time-to-answer for one pass over
    #    the DISTINCT scenes at minimal lane counts (the saturated-batch
    #    scenes/s above cannot show it; reference notebooks report the
    #    per-scene runtime sum, adelaideH.ipynb final cell),
    #  * the synthetic full-cardinality 19 H + 18 F dataset
    #    (eval/synth_adelaide.py) through the same throughput_batch path —
    #    full-dataset-scale evidence for the multi-bucket harness. MEs on
    #    synthetic geometry are NOT comparable to the published per-scene
    #    numbers; they gate harness correctness at scale.
    import os

    extras = {}
    if os.environ.get("PROGX_BENCH_EXTRAS", "1") != "0":
        from progressivex_tpu.eval.adelaide import (
            dataset_pass_seconds, throughput_batch)
        from progressivex_tpu.eval.synth_adelaide import ensure_synth_dataset

        hp_s, hp_n, hp_c = dataset_pass_seconds("H")
        fp_s, fp_n, fp_c = dataset_pass_seconds("F")
        print(
            f"dataset pass: H {hp_n} scenes in {hp_s * 1e3:.1f} ms, "
            f"F {fp_n} scenes in {fp_s * 1e3:.1f} ms "
            f"(extra compiles {hp_c + fp_c:.1f}s)",
            file=sys.stderr,
        )
        sh = throughput_batch("H", root=ensure_synth_dataset("H"),
                              n_timing_runs=1, lane_target=1)
        sf = throughput_batch("F", root=ensure_synth_dataset("F"),
                              n_timing_runs=1, lane_target=1)
        print(
            f"synthetic full-cardinality: H {sh[2]} scenes ME={sh[1]:.4f}, "
            f"F {sf[2]} scenes ME={sf[1]:.4f}",
            file=sys.stderr,
        )
        extras = {
            "adelaideH_dataset_seconds": round(hp_s, 4),
            "adelaideH_dataset_n_scenes": hp_n,
            "adelaideF_dataset_seconds": round(fp_s, 4),
            "adelaideF_dataset_n_scenes": fp_n,
            "extras_compile_seconds": round(hp_c + fp_c + sh[4] + sf[4], 1),
            "synth19H_n_scenes": sh[2],
            "synth19H_mean_misclassification": round(sh[1], 4),
            "synth19H_dataset_seconds": round(sh[2] / sh[0], 4),
            "synth18F_n_scenes": sf[2],
            "synth18F_mean_misclassification": round(sf[1], 4),
            "synth18F_dataset_seconds": round(sf[2] / sf[0], 4),
        }

    # Reference MEs on the SAME scenes (saved notebook outputs): full
    # datasets -> the published means; bundled fallback -> the reference's
    # per-scene values for exactly those scenes (adelaideH.ipynb:
    # oldclassicswing 0.005, unionhouse 0.006, unihouse 0.186;
    # adelaideF.ipynb: book 0.032, breadcube 0.017, cubetoy 0.012).
    h_ref = 0.064 if h_full else round((0.005 + 0.006 + 0.186) / 3, 4)
    f_ref = 0.109 if f_full else round((0.032 + 0.017 + 0.012) / 3, 4)
    print(json.dumps({
        "metric": "adelaideH_scenes_per_sec",
        "value": round(h_sps, 3),
        "unit": "scenes/s",
        "vs_baseline": round(h_sps / 13.0, 3),
        "mean_misclassification": round(h_me, 4),
        "baseline_misclassification_same_scenes": h_ref,
        "n_scenes_batched": h_n,
        "full_dataset_H": h_full,
        "adelaideF_scenes_per_sec": round(f_sps, 3),
        "adelaideF_vs_baseline": round(f_sps / 1.5, 3),
        "adelaideF_mean_misclassification": round(f_me, 4),
        "adelaideF_baseline_misclassification_same_scenes": f_ref,
        "adelaideF_n_scenes_batched": f_n,
        "full_dataset_F": f_full,
        "tless_rotation_errors_deg": rot_errs,
        "tless_translation_errors_mm": tr_errs,
        "tless_ref_rotation_errors_deg": [8.25, 0.95],
        "tless_ref_translation_errors_mm": [24.0, 12.2],
        "tless_time_s": round(pose_time, 3),
        "tless_ref_time_s": 57.57,
        "compile_seconds_all_programs": round(h_compile, 1),
        **extras,
    }))


if __name__ == "__main__":
    main()
