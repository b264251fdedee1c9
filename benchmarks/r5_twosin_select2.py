#!/usr/bin/env python
"""Selector-diversity battery on the TwoSin tails (round-5 follow-up).

`r5_twosin_select.py` measured the honest negative: per-member L-BFGS tails
improved 2/8 TwoSin members (best u .0286 — below the best solo twosin_weak
ever recorded) but NO shipped truth-free selector finds them (score regret
.066, consensus/rank .0249; PARITY §4t). Hypothesis: the residual score
fails because a causal-locked tail has a LOW raw pointwise residual — its
error is a misplaced shock, a displacement-scale defect that a fine-cell
mean-square underweights. The new multi-scale diagnostics
(`selection_scores(coarse_scales=...)`: mean |cell-mean conservation
defect| + weak entropy violation over 2-16x coarser control volumes)
integrate the residual over displacement-scale volumes and should see it.

This re-runs the SAME tails from the committed Adam checkpoint
(benchmarks/results/r4_artifacts/twosin_ens8_adam.ckpt — deterministic:
the tailed member rel-L2s must reproduce r5_twosin_select.jsonl) and
grades EVERY truth-free signal's argmin against the oracle member:
data_term, resid_ms, score, consensus, rank, coarse_r{2,4,8,16},
coarse_ent{2,4,8,16}. Writes benchmarks/results/r5_twosin_select2.jsonl.
--toy runs a CPU flush test.
"""

import json
import os
import sys
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.parallel.ensemble import (
    init_ensemble_states,
    run_ensemble,
    select_member,
    selection_scores,
    stack_states,
    unstack_states,
)
from pinns_tpu.train import Trainer
from pinns_tpu.train.checkpoint import load_checkpoint, save_checkpoint

OUT = "benchmarks/results/r5_twosin_select2.jsonl"
CKPT = "benchmarks/results/r4_artifacts/twosin_ens8_adam.ckpt"
SCALES = (2.0, 4.0, 8.0, 16.0)

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


def main(base, toy=False):
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

    if os.path.exists(CKPT):
        template = init_ensemble_states(tr_adam, seeds)
        stacked_adam = load_checkpoint(CKPT, template)
        print(f"resumed from {CKPT}", flush=True)
    else:
        stacked_adam, _ = run_ensemble(tr_adam, seeds)
        os.makedirs(os.path.dirname(CKPT), exist_ok=True)
        save_checkpoint(CKPT, stacked_adam, meta={"seeds": seeds})

    tail_ckpt = CKPT.replace("_adam", "_tailed")
    t0 = time.time()
    if os.path.exists(tail_ckpt):
        template = init_ensemble_states(tr_tail, seeds)
        stacked = load_checkpoint(tail_ckpt, template)
        summaries = [tr_tail.evaluate(m)
                     for m in unstack_states(stacked, len(seeds))]
        print(f"resumed tails from {tail_ckpt}", flush=True)
    else:
        tailed, summaries = [], []
        for m in unstack_states(stacked_adam, len(seeds)):
            st, s = tr_tail.train(m)
            tailed.append(st)
            summaries.append(s)
        stacked = stack_states(tailed)
        # persist: the battery below is a FRESH compile (relay-crash
        # hazard) — a CPU process can re-grade from this checkpoint
        save_checkpoint(tail_ckpt, stacked, meta={"seeds": seeds})
    wall = round(time.time() - t0, 1)

    scores = selection_scores(
        tr_tail, stacked, len(seeds), seed=base + 777,
        anchor_params=stacked_adam.params, coarse_scales=SCALES,
    )
    rel = [round(float(s["rel_l2_u"]), 4) for s in summaries]
    oracle = min(range(len(rel)), key=lambda i: rel[i])

    signals = ["data_term", "resid_ms", "score", "consensus"]
    signals += [f"coarse_r{s:g}" for s in SCALES]
    signals += [f"coarse_ent{s:g}" for s in SCALES]
    picks = {k: select_member(scores, by=k) for k in signals}
    picks["rank"] = select_member(scores, by="rank")
    emit({
        "tag": f"twosin2_base{base}",
        "wall_s": wall,
        "members_u": rel,
        "oracle": oracle,
        "battery": [
            {k: round(float(v), 6) for k, v in s.items()} for s in scores
        ],
        "picks": picks,
        "regret_u": {
            k: round(rel[i] - rel[oracle], 4) for k, i in picks.items()
        },
    })

    # same battery on the ADAM members (free second instance: does any
    # signal rank the untailed ensemble too?)
    scores_a = selection_scores(
        tr_adam, stacked_adam, len(seeds), seed=base + 777,
        anchor_params=stacked_adam.params, coarse_scales=SCALES,
    )
    rel_a = [round(float(tr_adam.evaluate(m)["rel_l2_u"]), 4)
             for m in unstack_states(stacked_adam, len(seeds))]
    oracle_a = min(range(len(rel_a)), key=lambda i: rel_a[i])
    picks_a = {k: select_member(scores_a, by=k) for k in signals}
    picks_a["rank"] = select_member(scores_a, by="rank")
    emit({
        "tag": f"twosin2_adam_base{base}",
        "members_u": rel_a,
        "oracle": oracle_a,
        "battery": [
            {k: round(float(v), 6) for k, v in s.items()} for s in scores_a
        ],
        "picks": picks_a,
        "regret_u": {
            k: round(rel_a[i] - rel_a[oracle_a], 4)
            for k, i in picks_a.items()
        },
    })


if __name__ == "__main__":
    args = sys.argv[1:]
    toy = "--toy" in args
    cpu = "--cpu" in args  # full config on CPU (relay-crash fallback:
    #                        resumes the tailed ckpt and grades the battery)
    args = [a for a in args if not a.startswith("--")]
    if toy or cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if toy:
        OUT = OUT.replace(".jsonl", "_toy.jsonl")
        CKPT = CKPT.replace(".ckpt", "_toy.ckpt")
    main(int(args[0]) if args else 1234, toy=toy)
