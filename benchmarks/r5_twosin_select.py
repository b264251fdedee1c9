#!/usr/bin/env python
"""Selection transfer to TwoSin (VERDICT-r4 #5).

L-BFGS tails measured negative SOLO on twosin_weak (PARITY §4o: 0.0475 ->
0.0665 — the causal-weighted objective keeps moving, a full-batch polish
locks in the wrong point). On Euler, ensemble -> per-member tails ->
consensus-argmin rescued the tails (regret 0.0 where the residual score had
regret .1031, PARITY §4r). The mechanism is problem-agnostic; this runs it
on the flagship data (`Abgrall_ADMM.py:271` — TwoSin_burgers_shock):

1. 8-member vmapped Adam ensemble (twosin_weak, 200k cosine), checkpointed;
2. per-member solo L-BFGS tails (50 outer epochs past the switch);
3. grade BOTH truth-free selectors (residual score, consensus distance to
   the Adam-ensemble mean) against the oracle + the gated mean.

Writes benchmarks/results/r5_twosin_select.jsonl. --toy runs a CPU flush
test; --resume reuses the Adam checkpoint.
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
)
from pinns_tpu.train import Trainer
from pinns_tpu.train.checkpoint import load_checkpoint, save_checkpoint

OUT = "benchmarks/results/r5_twosin_select.jsonl"
CKPT = "benchmarks/results/r4_artifacts/twosin_ens8_adam.ckpt"

HYBRID = {
    "optimizer.kind": "hybrid",
    "optimizer.switch_epoch": 200_000,
    "train.epochs": 200_050,
    "train.log_every": 0,
}
TOY = {
    "model.layers": (2, 12, 12, 1), "sampling.n_f": 128,
    "train.epochs": 200, "train.chunk": 100,
    "optimizer.schedule_epochs": 200,
}
TOY_TAIL = {
    **TOY,
    "train.epochs": 210,
    "optimizer.switch_epoch": 200, "optimizer.lbfgs.max_iters": 5,
}


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _rel(summaries):
    return [
        {k: round(float(v), 4) for k, v in s.items() if "rel_l2" in k}
        for s in summaries
    ]


def mean_rel(tr, stacked):
    from pinns_tpu.train.evaluate import relative_l2

    ds = tr.problem.dataset
    preds = ensemble_predict(tr, stacked, ds.X_star)
    return {
        f"rel_l2_{k}": round(relative_l2(preds[k]["mean"], ds.star[k]), 4)
        for k in preds if k in ds.star
    }


def main(base, resume=False, toy=False):
    ov = {"train.log_every": 0, "train.seed": base}
    if toy:
        ov.update(TOY)
    exp_adam = override(get_preset("twosin_weak"), ov)
    exp_tail = override(get_preset("twosin_weak"),
                        {**HYBRID, "train.seed": base,
                         **(TOY_TAIL if toy else {})})
    tr_adam = Trainer(exp_adam)
    tr_tail = Trainer(exp_tail)
    seeds = [base + i for i in range(8)]

    if resume and os.path.exists(CKPT):
        template = init_ensemble_states(tr_adam, seeds)
        stacked_adam = load_checkpoint(CKPT, template)
        adam_summ = [tr_adam.evaluate(m)
                     for m in unstack_states(stacked_adam, len(seeds))]
        adam_wall = 0.0
        print(f"resumed from {CKPT}", flush=True)
    else:
        t0 = time.time()
        stacked_adam, adam_summ = run_ensemble(tr_adam, seeds)
        adam_wall = round(time.time() - t0, 1)
        os.makedirs(os.path.dirname(CKPT), exist_ok=True)
        save_checkpoint(CKPT, stacked_adam, meta={"seeds": seeds})

    # -- per-member solo tails ---------------------------------------------
    t0 = time.time()
    members = unstack_states(stacked_adam, len(seeds))
    tailed, summaries = [], []
    for m in members:
        st, s = tr_tail.train(m)
        tailed.append(st)
        summaries.append(s)
    stacked = stack_states(tailed)
    wall = round(adam_wall + time.time() - t0, 1)

    # -- both truth-free selectors vs oracle --------------------------------
    scores = selection_scores(tr_tail, stacked, len(seeds),
                              seed=base + 777,
                              anchor_params=stacked_adam.params)
    rel = _rel(summaries)
    oracle = min(range(len(rel)), key=lambda i: rel[i]["rel_l2_u"])
    sel = select_member(scores)
    sel_c = select_member(scores, by="consensus")
    sel_r = select_member(scores, by="rank")
    emit({
        "tag": f"twosin_ens8_base{base}",
        "wall_s": wall,
        "adam_members": _rel(adam_summ),
        "members": rel,
        "scores": [round(s["score"], 6) for s in scores],
        "consensus": [round(s["consensus"], 6) for s in scores],
        "selected": sel, "selected_rel": rel[sel],
        "selected_consensus": sel_c, "selected_consensus_rel": rel[sel_c],
        "selected_rank": sel_r, "selected_rank_rel": rel[sel_r],
        "oracle": oracle, "oracle_rel": rel[oracle],
        "regret_u": round(rel[sel]["rel_l2_u"] - rel[oracle]["rel_l2_u"], 4),
        "regret_consensus_u": round(
            rel[sel_c]["rel_l2_u"] - rel[oracle]["rel_l2_u"], 4),
        "regret_rank_u": round(
            rel[sel_r]["rel_l2_u"] - rel[oracle]["rel_l2_u"], 4),
    })

    # -- consensus-gated mean (same construct as r4_combo_study) ------------
    cons_adam = [s["consensus"] for s in selection_scores(
        tr_tail, stacked_adam, len(seeds), seed=base + 777,
        anchor_params=stacked_adam.params)]
    gate = max(cons_adam)
    keep = [s["consensus"] <= gate for s in scores]
    gated = stack_states([
        t if k else a for t, a, k in
        zip(unstack_states(stacked, len(seeds)),
            unstack_states(stacked_adam, len(seeds)), keep)
    ])
    emit({
        "tag": f"twosin_gated_mean_base{base}",
        "gate": round(gate, 6),
        "kept_tails": [int(k) for k in keep],
        "adam_mean_rel": mean_rel(tr_tail, stacked_adam),
        "tailed_mean_rel": mean_rel(tr_tail, stacked),
        "gated_mean_rel": mean_rel(tr_tail, gated),
    })


if __name__ == "__main__":
    args = sys.argv[1:]
    toy = "--toy" in args
    resume = "--resume" in args
    args = [a for a in args if not a.startswith("--")]
    if toy:
        import jax

        jax.config.update("jax_platforms", "cpu")
        OUT = OUT.replace(".jsonl", "_toy.jsonl")
        CKPT = CKPT.replace(".ckpt", "_toy.ckpt")
    main(int(args[0]) if args else 1234, resume=resume, toy=toy)
