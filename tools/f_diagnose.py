"""Dev diagnostic: why do F scenes roll catastrophic labelings?

Runs one AdelaideRMF-F scene through the flattened-restart batch program
(same as eval/adelaide) and scores EVERY restart replica, not just the
energy-selected winner. For each lane it prints the per-restart
(energy, n_models, ME) triples plus which restart the selector picked —
separating "the selector misranks" (a low-ME replica existed but a
lower-energy bad one won) from "all restarts failed" (the search or the
labeling optimizer never found the good basin).

    python tools/f_diagnose.py --scene cubetoy --lanes 16 --seeds 2
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize force-registers the remote TPU backend over the env
    # var; config.update is the effective override (see tests/conftest.py).
    import jax

    jax.config.update("jax_platforms", "cpu")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="cubetoy")
    p.add_argument("--lanes", type=int, default=16)
    p.add_argument("--seeds", type=int, default=2)
    p.add_argument("--restarts", type=int, default=None)
    p.add_argument("--dump", default=None,
                   help="save per-restart labels/energy/K/ME to this .npz "
                        "for offline selector-rule simulation")
    p.add_argument("--set", action="append", default=[], metavar="K=V",
                   help="EngineConfig field override (int), e.g. "
                        "--set final_polish=2 --set final_relabel=4")
    args = p.parse_args()

    import jax

    from progressivex_tpu.api import _hyp_budget, _n_subbatches
    from progressivex_tpu.core.config import EngineConfig
    from progressivex_tpu.core.engine import (
        FitResult,
        compact_result,
        select_restart,
    )
    from progressivex_tpu.eval.adelaide import (
        F_PROTOCOL,
        _LaneBatch,
        discover_scenes,
    )
    from progressivex_tpu.io.data import load_corr_scene
    from progressivex_tpu.io.metrics import misclassification
    from progressivex_tpu.models import get_family

    kw = dict(F_PROTOCOL)
    family = get_family("fundamental")
    n_restarts = args.restarts or int(kw.get("n_restarts", 1))
    n_hyp = _hyp_budget(kw["max_iters"], family.max_solutions, family.name)
    cfg = EngineConfig(
        family=family.name,
        n_hypotheses=n_hyp,
        n_subbatches=_n_subbatches(kw["max_iters"], n_hyp),
        sampler_id=int(kw["sampler_id"]),
        magsac_levels=int(kw.get("magsac_levels", 0)),
        final_relabel=int(kw.get("final_relabel", 0)),
        max_rounds=int(kw.get("max_rounds", 10)),
        pearl_iters=int(kw.get("pearl_iters", 3)),
    )
    if args.set:
        import dataclasses

        from tools.compile_probe import parse_override

        cfg = dataclasses.replace(
            cfg, **dict(parse_override(s) for s in args.set))
        print(f"config overrides: {args.set}", file=sys.stderr)
    root, names, _ = discover_scenes("F")
    assert args.scene in names, f"{args.scene} not in {names}"
    scenes = [load_corr_scene(args.scene, root=root)]
    lane_ids = [0] * args.lanes
    batch = _LaneBatch(family, cfg, kw, scenes, [args.scene], lane_ids,
                       256, args.lanes, n_restarts, seed=0)
    batch.compile()

    lanes = args.lanes
    nv = scenes[0][0].shape[0]
    gt = scenes[0][1]
    picked, best, rows = [], [], []
    dump_lab, dump_e, dump_k, dump_me = [], [], [], []
    for s in range(args.seeds):
        keys = jax.random.split(jax.random.PRNGKey(s + 1), batch.ns)
        res = batch.run(batch.data, batch.mask, batch.wts, keys, batch.nv)
        energy = np.asarray(res.energy).reshape(n_restarts, lanes)
        pref = np.asarray(res.compound_pref).reshape(n_restarts, lanes, -1)
        nm = np.asarray(res.n_models).reshape(n_restarts, lanes)
        me = np.zeros((n_restarts, lanes))
        lab = np.zeros((n_restarts, lanes, nv), np.int32)
        for r in range(n_restarts):
            for j in range(lanes):
                one = jax.tree.map(
                    lambda x: np.asarray(x[r * lanes + j]), res)
                _, labels = compact_result(FitResult(*one), nv)
                lab[r, j] = labels
                me[r, j] = misclassification(labels, gt)
        dump_lab.append(lab)
        dump_e.append(energy)
        dump_k.append(nm)
        dump_me.append(me)
        for j in range(lanes):
            pick = int(select_restart(energy[:, j], pref[:, j],
                                      batch.restart_rule, nm[:, j]))
            picked.append(me[pick, j])
            best.append(me[:, j].min())
            tag = ("SELECTOR-MISS" if me[pick, j] > me[:, j].min() + 0.02
                   else ("ALL-BAD" if me[:, j].min() > 0.05 else "ok"))
            rows.append((s, j, pick, tag))
            print(f"seed {s} lane {j:2d} pick={pick} {tag:13s} " + "  ".join(
                f"[r{r} E={energy[r, j]:9.2f} K={nm[r, j]} ME={me[r, j]:.3f}]"
                + ("*" if r == pick else "")
                for r in range(n_restarts)))
    if args.dump:
        # Axes: [seeds, restarts, lanes(, n_valid)].
        np.savez(args.dump, labels=np.stack(dump_lab),
                 energy=np.stack(dump_e), n_models=np.stack(dump_k),
                 me=np.stack(dump_me), gt=gt, scene=args.scene)
        print(f"dumped -> {args.dump}", file=sys.stderr)
    picked, best = np.array(picked), np.array(best)
    n_miss = sum(1 for *_x, t in rows if t == "SELECTOR-MISS")
    n_allbad = sum(1 for *_x, t in rows if t == "ALL-BAD")
    print(f"\n{args.scene}: picked-mean ME {picked.mean():.4f}  "
          f"oracle-best-mean ME {best.mean():.4f}  "
          f"selector-miss {n_miss}/{len(rows)}  all-bad {n_allbad}/{len(rows)}")


if __name__ == "__main__":
    main()
