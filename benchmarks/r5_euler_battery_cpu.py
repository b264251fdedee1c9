#!/usr/bin/env python
"""Grade the multi-scale conservation-defect battery on the SAVED Euler
Adam ensembles — CPU-only, no TPU process (relay stays free for the queue).

The coarse-cell diagnostics (`selection_scores(coarse_scales=...)`) were
built to catch misplaced-shock tails on TwoSin (r5_twosin_select2.py). The
committed Euler Adam checkpoints (bases 7000/99000, r4_artifacts/) give two
free extra grading instances: for each, rank all 8 UNTAILED members by
every truth-free signal and report argmin regret + Spearman rank
correlation vs the oracle rel-L2(u). Writes
benchmarks/results/r5_euler_battery_cpu.jsonl.
"""

import json
import time

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from pinns_tpu.config import override  # noqa: E402
from pinns_tpu.experiments import get_preset  # noqa: E402
from pinns_tpu.parallel.ensemble import (  # noqa: E402
    init_ensemble_states,
    select_member,
    selection_scores,
    unstack_states,
)
from pinns_tpu.train import Trainer  # noqa: E402
from pinns_tpu.train.checkpoint import load_checkpoint  # noqa: E402

OUT = "benchmarks/results/r5_euler_battery_cpu.jsonl"
SCALES = (2.0, 4.0, 8.0, 16.0)
CKPTS = {
    7000: "benchmarks/results/r4_artifacts/euler_ens8_adam_b7000.ckpt",
    99000: "benchmarks/results/r4_artifacts/euler_ens8_adam_b99000.ckpt",
}


def spearman(a, b):
    ra = np.argsort(np.argsort(a)).astype(float)
    rb = np.argsort(np.argsort(b)).astype(float)
    ra -= ra.mean()
    rb -= rb.mean()
    return float((ra * rb).sum() / np.sqrt((ra**2).sum() * (rb**2).sum()))


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    tr = Trainer(override(get_preset("euler_weak_fast"),
                          {"train.log_every": 0}))
    for base, ckpt in CKPTS.items():
        seeds = [base + i for i in range(8)]
        t0 = time.time()
        stacked = load_checkpoint(ckpt, init_ensemble_states(tr, seeds))
        scores = selection_scores(
            tr, stacked, 8, seed=base + 777, coarse_scales=SCALES,
        )
        rel = [round(float(tr.evaluate(m)["rel_l2_u"]), 4)
               for m in unstack_states(stacked, 8)]
        oracle = min(range(8), key=lambda i: rel[i])
        signals = (["data_term", "resid_ms", "score"]
                   + [f"coarse_r{s:g}" for s in SCALES]
                   + [f"coarse_ent{s:g}" for s in SCALES])
        picks = {k: select_member(scores, by=k) for k in signals}
        emit({
            "tag": f"euler_adam_battery_b{base}",
            "wall_s": round(time.time() - t0, 1),
            "members_u": rel,
            "oracle": oracle,
            "battery": [{k: round(float(v), 6) for k, v in s.items()}
                        for s in scores],
            "picks": picks,
            "regret_u": {k: round(rel[i] - rel[oracle], 4)
                         for k, i in picks.items()},
            "spearman_u": {
                k: round(spearman([s[k] for s in scores], rel), 3)
                for k in signals
            },
        })
