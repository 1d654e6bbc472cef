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
    from progressivex_tpu.eval.adelaide import throughput_batch

    h_sps, h_me, h_n, h_full, h_compile = throughput_batch("H", reps=8)
    print(
        f"H: {h_sps:.2f} scenes/s ME={h_me:.4f} "
        f"(batch={h_n}, full_dataset={h_full}, compile={h_compile:.1f}s)",
        file=sys.stderr,
    )
    f_sps, f_me, f_n, f_full, f_compile = throughput_batch("F", reps=8)
    print(
        f"F: {f_sps:.2f} scenes/s ME={f_me:.4f} "
        f"(batch={f_n}, full_dataset={f_full}, compile={f_compile:.1f}s)",
        file=sys.stderr,
    )

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
    }))


if __name__ == "__main__":
    main()
