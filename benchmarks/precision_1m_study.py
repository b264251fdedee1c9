#!/usr/bin/env python
"""Validate model.precision='default' at the Euler 1M envelope (VERDICT r2
item 4): the 4.4x step speedup was measured at 200k only; this pins quality
and wall-clock at the shipped euler_weak 1M config before recommending the
lever beyond the fast preset.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/precision_1m_study.py [seeds...]
Writes benchmarks/results/r3_precision_1m.jsonl.
"""

import json
import sys
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

OUT = "benchmarks/results/r3_precision_1m.jsonl"


def run(seed):
    exp = override(
        get_preset("euler_weak"),
        {
            "name": f"eu1m_prec_default_s{seed}",
            "model.precision": "default",
            "train.seed": seed,
            "train.log_every": 0,
            "train.out_dir": "",
        },
    )
    t0 = time.time()
    _, s = Trainer(exp).train()
    rec = {
        "tag": f"eu_1m_precdefault_s{seed}",
        "wall_s": round(time.time() - t0, 1),
        **{k: round(float(v), 4) for k, v in s.items() if "rel_l2" in k},
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    seeds = [int(s) for s in sys.argv[1:]] or [1234]
    for seed in seeds:
        run(seed)
