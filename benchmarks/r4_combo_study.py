#!/usr/bin/env python
"""Combined UQ-front + Euler-best study sharing ONE 8-member ensemble.

The round-4 TPU queue was killed mid `uq_front_study` after its 8-member
euler_weak_fast Adam ensemble finished 200k iters (~75 min) but before the
calibration half ran — the trained members were lost (no checkpoint). This
script merges the two queue steps that train the SAME ensemble (same
preset, same seed block 1234..1241, same Adam-200k-cosine schedule):

1. train the 8-member Adam ensemble once (vmapped),
2. CHECKPOINT it immediately (crash insurance; ``--resume`` skips retrain),
3. uq_front half: grade std- vs dx-binned Mondrian conformal on the Adam
   members and export the dx-calibrated artifact (VERDICT-r3 #6),
4. euler_best half: run the 50-epoch L-BFGS tail per member SOLO (the
   vmapped wide-net L-BFGS compile is the known pathological remote
   compile), select by the ground-truth-free score, report selected vs
   oracle rel-L2 (VERDICT-r3 #3).

Rows append to the two studies' own JSONL files so downstream tooling is
unchanged. Extra base seeds (full independent euler_best runs) can be
passed as args for replication when queue time remains.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/r4_combo_study.py
  python benchmarks/r4_combo_study.py --toy          # CPU flush-test
  python benchmarks/r4_combo_study.py --resume       # reuse checkpoint
  python benchmarks/r4_combo_study.py 7000 99000     # extra solo runs
"""

import json
import os
import sys
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.parallel.ensemble import (
    ensemble_predict,
    init_ensemble_states,
    run_ensemble,
    select_member,
    selection_scores,
    stack_states,
    unstack_states,
    uq_calibration,
)
from pinns_tpu.serve import export_ensemble
from pinns_tpu.train import Trainer
from pinns_tpu.train.checkpoint import load_checkpoint, save_checkpoint

UQ_OUT = "benchmarks/results/r4_uq_front.jsonl"
BEST_OUT = "benchmarks/results/r4_euler_best.jsonl"
ART = "benchmarks/results/r4_artifacts"
CKPT = "benchmarks/results/r4_artifacts/euler_ens8_adam.ckpt"

HYBRID = {
    "optimizer.kind": "hybrid",
    "optimizer.switch_epoch": 200_000,
    "train.epochs": 200_050,
    "train.log_every": 0,
}

TOY = {
    "model.layers": (2, 12, 12, 3), "sampling.n_f": 128,
    "train.epochs": 200, "train.chunk": 100,
    "sampling.t_curriculum_epochs": 0,
}
TOY_TAIL = {
    **TOY,
    "train.epochs": 210,  # 10 L-BFGS tail epochs past the switch
    "optimizer.switch_epoch": 200, "optimizer.lbfgs.max_iters": 5,
}


def emit(path, rec):
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _round4(v):
    if isinstance(v, list):
        return [round(float(x), 4) for x in v]
    return v if isinstance(v, str) else round(float(v), 4)


def _rel(summaries):
    return [
        {k: round(float(v), 4) for k, v in s.items() if "rel_l2" in k}
        for s in summaries
    ]


def adam_ensemble(tr, seeds, resume):
    """Train (or reload) the stacked Adam ensemble, with checkpoint."""
    if resume and os.path.exists(CKPT):
        template = init_ensemble_states(tr, seeds)
        stacked = load_checkpoint(CKPT, template)
        print(f"resumed stacked ensemble from {CKPT}", flush=True)
        # summaries are already in the JSONL from the run that wrote the
        # checkpoint; recompute rel-L2 only (cheap) for the best-member calc
        summaries = [
            tr.evaluate(m) for m in unstack_states(stacked, len(seeds))
        ]
        return stacked, summaries, 0.0
    t0 = time.time()
    stacked, summaries = run_ensemble(tr, seeds)
    wall = round(time.time() - t0, 1)
    os.makedirs(ART, exist_ok=True)
    save_checkpoint(CKPT, stacked, meta={"seeds": seeds})
    return stacked, summaries, wall


def uq_half(tr, stacked, summaries, wall):
    emit(UQ_OUT, {"tag": "euler_ens8", "wall_s": wall,
                  "members": _rel(summaries)})
    for feature in ("std", "dx"):
        cal = uq_calibration(tr, stacked, mond_feature=feature)
        emit(UQ_OUT, {"tag": f"calibration_{feature}", **{
            f: {k: _round4(v) for k, v in row.items()}
            for f, row in cal.items()
        }})
        if feature == "dx":
            os.makedirs(ART, exist_ok=True)
            # toy flush-tests must not overwrite the real artifact
            name = ("euler_ens8_dx_toy" if UQ_OUT.endswith("_toy.jsonl")
                    else "euler_ens8_dx")
            path = export_ensemble(
                tr, stacked.params,
                os.path.join(ART, name), calibration=cal,
            )
            emit(UQ_OUT, {"tag": "artifact", "path": path})


def mean_rel(tr, stacked):
    """rel-L2 of the ensemble-MEAN prediction per field (the §4r
    deployable construct)."""
    from pinns_tpu.train.evaluate import relative_l2

    ds = tr.problem.dataset
    preds = ensemble_predict(tr, stacked, ds.X_star)
    return {
        f"rel_l2_{k}": round(relative_l2(preds[k]["mean"], ds.star[k]), 4)
        for k in preds if k in ds.star
    }


def select_and_emit(tr, stacked, summaries, base_seed, n, wall,
                    anchor_params=None):
    """Ground-truth-free selection + regret row (shared with
    euler_best_study.py, which delegates here). With ``anchor_params``
    (the Adam ensemble the tails started from) the consensus-distance
    selector is graded alongside the residual score."""
    scores = selection_scores(tr, stacked, n, seed=base_seed + 777,
                              anchor_params=anchor_params)
    sel = select_member(scores)
    rel = _rel(summaries)
    oracle = min(range(len(rel)), key=lambda i: rel[i]["rel_l2_u"])
    rec = {
        "tag": f"hybrid_ens8_base{base_seed}",
        "wall_s": wall,
        "members": rel,
        "scores": [round(s["score"], 6) for s in scores],
        "selected": sel,
        "selected_rel": rel[sel],
        "oracle": oracle,
        "oracle_rel": rel[oracle],
        "regret_u": round(rel[sel]["rel_l2_u"] - rel[oracle]["rel_l2_u"], 4),
    }
    if anchor_params is not None:
        sel_c = select_member(scores, by="consensus")
        sel_r = select_member(scores, by="rank")
        rec.update({
            "consensus": [round(s["consensus"], 6) for s in scores],
            "selected_consensus": sel_c,
            "selected_consensus_rel": rel[sel_c],
            "regret_consensus_u": round(
                rel[sel_c]["rel_l2_u"] - rel[oracle]["rel_l2_u"], 4
            ),
            "selected_rank": sel_r,
            "selected_rank_rel": rel[sel_r],
            "regret_rank_u": round(
                rel[sel_r]["rel_l2_u"] - rel[oracle]["rel_l2_u"], 4
            ),
        })
    emit(BEST_OUT, rec)
    return scores


def tails_half(tr_tail, stacked_adam, base_seed, n, adam_wall):
    t0 = time.time()
    members = unstack_states(stacked_adam, n)
    tailed, summaries = [], []
    for m in members:
        st, s = tr_tail.train(m)
        tailed.append(st)
        summaries.append(s)
    stacked = stack_states(tailed)
    wall = round(adam_wall + time.time() - t0, 1)
    scores = select_and_emit(tr_tail, stacked, summaries, base_seed, n,
                             wall, anchor_params=stacked_adam.params)

    # Consensus-GATED mean: per member, keep the tailed version only while
    # it stays inside the Adam ensemble's own consensus envelope (max
    # member-to-mean distance); revert drifted tails to their Adam start.
    # Grades the deployable that combines tail upside with mean robustness.
    cons_tail = [s["consensus"] for s in scores]
    cons_adam = [s["consensus"] for s in selection_scores(
        tr_tail, stacked_adam, n, seed=base_seed + 777,
        anchor_params=stacked_adam.params)]
    gate = max(cons_adam)
    keep = [ct <= gate for ct in cons_tail]
    # members' buffers were donated into tr_tail.train — slice fresh ones
    gated = stack_states([
        t if k else a for t, a, k in
        zip(unstack_states(stacked, n), unstack_states(stacked_adam, n),
            keep)
    ])
    emit(BEST_OUT, {
        "tag": f"gated_mean_base{base_seed}",
        "gate": round(gate, 6),
        "kept_tails": [int(k) for k in keep],
        "adam_mean_rel": mean_rel(tr_tail, stacked_adam),
        "tailed_mean_rel": mean_rel(tr_tail, stacked),
        "gated_mean_rel": mean_rel(tr_tail, gated),
    })


def main(bases, resume=False, toy=False, skip_base=False,
         halves=("uq", "best"), vmapped=False):
    """`halves` selects which studies run on the shared ensemble;
    `vmapped=True` opts into the one-program vmapped hybrid (the known
    pathological fresh wide-net L-BFGS remote compile — euler_best_study's
    --vmapped flag), which replaces the Adam+solo-tails split."""
    if vmapped and "uq" in halves:
        raise ValueError("vmapped hybrid has no Adam-only states for the "
                         "UQ half — use halves=('best',)")
    ov = {"train.log_every": 0}
    if toy:
        ov.update(TOY)
    exp_adam = override(get_preset("euler_weak_fast"), ov)
    exp_tail = override(get_preset("euler_weak_fast"),
                        {**HYBRID, **(TOY_TAIL if toy else {})})
    tr_adam = Trainer(exp_adam)
    tr_tail = Trainer(exp_tail)

    def one_vmapped(base_seed, seeds):
        t0 = time.time()
        stacked, summaries = run_ensemble(tr_tail, seeds)
        select_and_emit(tr_tail, stacked, summaries, base_seed, len(seeds),
                        round(time.time() - t0, 1))

    # -- shared block: base seed == preset seed (1234) --------------------
    if not skip_base:
        base = exp_adam.train.seed
        seeds = [base + i for i in range(8)]
        if vmapped:
            one_vmapped(base, seeds)
        else:
            stacked, summaries, wall = adam_ensemble(tr_adam, seeds, resume)
            if "uq" in halves:
                uq_half(tr_adam, stacked, summaries, wall)
            if "best" in halves:
                tails_half(tr_tail, stacked, base, len(seeds), wall)

    # -- extra independent euler_best replications -------------------------
    for b in bases:
        seeds = [b + i for i in range(8)]
        if vmapped:
            one_vmapped(b, seeds)
            continue
        # crash insurance for the ~75-min Adam phase (same pattern as the
        # shared block): checkpoint per base, resume if present
        ckpt_b = CKPT.replace(".ckpt", f"_b{b}.ckpt")
        if resume and os.path.exists(ckpt_b):
            template = init_ensemble_states(tr_adam, seeds)
            st = load_checkpoint(ckpt_b, template)
            wall = 0.0
            print(f"resumed base-{b} ensemble from {ckpt_b}", flush=True)
        else:
            t0 = time.time()
            st, _ = run_ensemble(tr_adam, seeds)
            wall = round(time.time() - t0, 1)
            save_checkpoint(ckpt_b, st, meta={"seeds": seeds})
        tails_half(tr_tail, st, b, len(seeds), wall)


if __name__ == "__main__":
    args = sys.argv[1:]
    toy = "--toy" in args
    resume = "--resume" in args
    skip_base = "--skip-base" in args
    best_only = "--best-only" in args
    args = [a for a in args if not a.startswith("--")]
    if "--r5" in sys.argv:
        # round-5 replication legs write to their own files (VERDICT-r4 #1:
        # ">=3 TPU bases in r5_euler_best.jsonl"); base-1234 rows stay in r4
        UQ_OUT = UQ_OUT.replace("/r4_", "/r5_")
        BEST_OUT = BEST_OUT.replace("/r4_", "/r5_")
    if toy:
        import jax

        jax.config.update("jax_platforms", "cpu")
        UQ_OUT = UQ_OUT.replace(".jsonl", "_toy.jsonl")
        BEST_OUT = BEST_OUT.replace(".jsonl", "_toy.jsonl")
        CKPT = CKPT.replace(".ckpt", "_toy.ckpt")
    main([int(s) for s in args], resume=resume, toy=toy,
         skip_base=skip_base,
         halves=("best",) if best_only else ("uq", "best"))
