#!/usr/bin/env python
"""Persistent (scale-free) causal selector study (round 3).

The shipped twosin_weak recipe must not be over-trained: absolute causal
weights fade to 1 as residuals vanish and the solution drifts (PARITY §4j:
0.0745 @ 200k -> 0.118 @ 500k). loss.causal_relative normalizes the causal
prefix by the batch-mean bin loss, making the weights scale-free so the
selection pressure persists. This study (a) tunes eps_rel at the 200k
budget, (b) runs the best cell to 500k — the drift test the absolute form
fails.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/causal_persist_study.py [tags]
Writes benchmarks/results/r3_causal_persist.jsonl.
"""

import json
import sys
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

OUT = "benchmarks/results/r3_causal_persist.jsonl"

RUNS = [
    # eps_rel sweep at the shipped 200k budget
    ("rel010", {"loss.causal_eps": 0.10, "loss.causal_relative": True}, None),
    ("rel020", {"loss.causal_eps": 0.20, "loss.causal_relative": True}, None),
    ("rel030", {"loss.causal_eps": 0.30, "loss.causal_relative": True}, None),
    # drift test: 500k epochs (cosine stretched to match) — the absolute
    # form measured 0.118 here vs 0.0745 at 200k
    ("rel020_500k",
     {"loss.causal_eps": 0.20, "loss.causal_relative": True,
      "train.epochs": 500_000, "optimizer.schedule_epochs": 500_000}, None),
    ("abs30_500k_control",
     {"train.epochs": 500_000, "optimizer.schedule_epochs": 500_000}, None),
]


def run(tag, overrides):
    base = {"train.log_every": 0, "train.out_dir": ""}
    base.update(overrides)
    exp = override(get_preset("twosin_weak"), base)
    t0 = time.time()
    _, s = Trainer(exp).train()
    rec = {
        "tag": tag,
        "epochs": exp.train.epochs,
        "wall_s": round(time.time() - t0, 1),
        **{k: round(float(v), 4) for k, v in s.items() if "rel_l2" in k},
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)
    return rec


if __name__ == "__main__":
    only = set(sys.argv[1:])
    for tag, ov, _ in RUNS:
        if only and tag not in only:
            continue
        run(tag, ov)
