"""Offline restart-selector simulation over f_diagnose.py dumps.

Loads the per-restart (labels, energy, n_models, ME) arrays captured on
device and replays candidate selection rules WITHOUT touching the TPU,
reporting the picked-mean ME per scene and pooled. Rules evaluated:

  energy        argmin energy (production default before this experiment)
  energy+l*K    argmin energy + lambda * n_models — a selection-time label
                cost: catastrophic K=3 "split" states sit within a few
                energy units of good K=2 states, while a genuinely needed
                extra structure lowers the energy by ~min_structure_size
                * (1 - w) >> lambda, so a small lambda is safe
  coclust       argmax sum of pairwise co-clustering agreement (fraction of
                point pairs on which two labelings agree about same-label /
                different-label), tie-break min energy — permutation-free,
                and unlike compound-preference Tanimoto (which a split
                state inherits almost unchanged, engine.select_restart
                docstring) it DOES see splits/collapses
  coclust+e     co-clustering agreement used as a gate: keep the restarts
                in the top half by agreement, pick min energy among them

    python tools/selector_sim.py /tmp/fdiag_*.npz
"""

import sys

import numpy as np


def coclust_sim(labels):
    """[R, N] labelings -> [R, R] pair-counting agreement."""
    r, n = labels.shape
    co = labels[:, :, None] == labels[:, None, :]  # [R, N, N]
    co = co.reshape(r, n * n).astype(np.float32)
    return (co @ co.T + (1 - co) @ (1 - co.T)) / (n * n)


def main():
    files = sys.argv[1:]
    rules = (["energy"]
             + [f"energy+{l}K" for l in (2, 3, 5, 8, 12)]
             + ["coclust", "coclust+e"])
    pooled = {r: [] for r in rules}
    pooled["oracle"] = []
    for f in files:
        d = np.load(f, allow_pickle=True)
        me, energy, nm, labels = d["me"], d["energy"], d["n_models"], d["labels"]
        s, r, lanes = me.shape
        per = {k: [] for k in rules}
        per["oracle"] = []
        for si in range(s):
            for j in range(lanes):
                e = energy[si, :, j]
                k = nm[si, :, j]
                m = me[si, :, j]
                lab = labels[si, :, j]  # [R, N]
                sim = coclust_sim(lab)
                agree = sim.sum(1) - np.diagonal(sim)
                per["oracle"].append(m.min())
                per["energy"].append(m[np.argmin(e)])
                for lam in (2, 3, 5, 8, 12):
                    per[f"energy+{lam}K"].append(m[np.argmin(e + lam * k)])
                # coclust: max agreement, tie-break energy
                top = np.flatnonzero(agree >= agree.max() - 1e-9)
                per["coclust"].append(m[top[np.argmin(e[top])]])
                # gate: top half by agreement, then min energy
                half = np.argsort(-agree)[: max(1, r // 2 + 1)]
                per["coclust+e"].append(m[half[np.argmin(e[half])]])
        name = str(d.get("scene", f))
        print(f"\n== {name} ({s}x{lanes} lanes, {r} restarts) ==")
        for k in ["oracle"] + rules:
            a = np.array(per[k])
            print(f"  {k:12s} mean {a.mean():.4f}  max {a.max():.3f}  "
                  f">0.1: {(a > 0.1).sum()}/{len(a)}")
            pooled[k].extend(per[k])
    print("\n== pooled ==")
    for k in ["oracle"] + rules:
        a = np.array(pooled[k])
        print(f"  {k:12s} mean {a.mean():.4f}  max {a.max():.3f}  "
              f">0.1: {(a > 0.1).sum()}/{len(a)}")


if __name__ == "__main__":
    main()
