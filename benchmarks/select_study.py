#!/usr/bin/env python
"""Ground-truth-free ensemble member selection — measured selector quality.

PARITY §4o left the L-BFGS hybrid tail as a *multi-seed-and-pick-best* tool:
on the Euler fast recipe it is a coin flip solo (u 0.0453 / 0.1759 / 0.1051
over 3 seeds) but its best member is the best fast-budget number measured.
"Pick best" by rel-L2 needs the exact solution a deployment does not have,
so `selection_scores` (parallel/ensemble.py) scores members with what the
run owns: the training-data misfit + the mean-square trained residual on a
fresh shared collocation batch. This study measures whether that selector
actually ranks members like the oracle does:

  1. ts_select    — twosin_weak 8-seed ensemble (the §4k band, 0.037-0.070):
                    moderate-spread sanity cell, ~8 min.
  2. eu_hybrid_select — euler_weak cosine-200k + L-BFGS tail, 8 seeds: the
                    high-variance case the workflow exists for (~80 min,
                    wide net => ~8x solo wall, PARITY §4l).

Per cell: per-member oracle rel-L2 + selector scores, Spearman rank
correlation per selector key, and the REGRET of the argmin member
(selected rel-L2 minus best member's). Results -> PARITY §4p.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/select_study.py [tags]
"""

import json
import sys
import time

import numpy as np

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.parallel.ensemble import (
    evaluate_ensemble,
    run_ensemble,
    select_member,
    selection_scores,
)
from pinns_tpu.train import Trainer

RUNS = [
    ("ts_select", "twosin_weak", {}, "rel_l2_u"),
    ("eu_hybrid_select", "euler_weak",
     {"optimizer.kind": "hybrid", "optimizer.switch_epoch": 200_000,
      "optimizer.lr_schedule": "cosine",
      "optimizer.schedule_epochs": 200_000,
      "train.epochs": 200_050, "train.chunk": 250}, "rel_l2_u"),
]

KEYS = ("score", "resid_ms", "data_term")


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    ra -= ra.mean()
    rb -= rb.mean()
    denom = np.sqrt((ra**2).sum() * (rb**2).sum())
    return float((ra * rb).sum() / denom) if denom else 0.0


def run(tag, preset, overrides, oracle_key, n=8):
    base = {"train.log_every": 0}
    base.update(overrides)
    exp = override(get_preset(preset), base)
    tr = Trainer(exp)
    seeds = [exp.train.seed + i for i in range(n)]
    t0 = time.time()
    stacked, _ = run_ensemble(tr, seeds)
    wall = round(time.time() - t0, 1)

    scores = selection_scores(tr, stacked, n)
    oracle = evaluate_ensemble(tr, stacked, n)
    rel_keys = [k for k in oracle[0] if "rel_l2" in k]
    for i in range(n):
        print(json.dumps({
            "tag": tag, "member": i, "seed": seeds[i],
            **{k: round(float(oracle[i][k]), 4) for k in rel_keys},
            **{k: float(f"{scores[i][k]:.6g}") for k in KEYS},
        }), flush=True)

    target = np.array([float(o[oracle_key]) for o in oracle])
    summary = {"tag": f"{tag}_summary", "wall_s": wall,
               "oracle_key": oracle_key,
               "best": round(float(target.min()), 4),
               "worst": round(float(target.max()), 4)}
    for key in KEYS:
        vals = np.array([s[key] for s in scores])
        pick = select_member(scores, by=key)
        summary[f"spearman_{key}"] = round(spearman(vals, target), 3)
        summary[f"picked_{key}"] = pick
        summary[f"picked_{key}_rel_l2"] = round(float(target[pick]), 4)
        summary[f"regret_{key}"] = round(float(target[pick] - target.min()), 4)
    # the full per-field numbers of the member the default selector ships
    pick = select_member(scores)
    summary["selected_member"] = pick
    for k in rel_keys:
        summary[f"selected_{k}"] = round(float(oracle[pick][k]), 4)
    print(json.dumps(summary), flush=True)


def main():
    only = set(sys.argv[1:])
    print("# ground-truth-free member selection", flush=True)
    for tag, preset, ov, okey in RUNS:
        if only and tag not in only:
            continue
        run(tag, preset, ov, okey)


if __name__ == "__main__":
    main()
