#!/usr/bin/env python
"""Euler cosine-LR promotion (round 2, follow-up to flux8_study).

flux8 found cosine LR decay is the one remaining lever that helps the
euler_weak mix recipe (u 0.080 -> 0.064 at 200k, nearly the 1M
constant-LR value in 1/5 the epochs); causal weighting hurts (conflicts
with the t-curriculum). This promotes cosine to the 1M envelope and
checks seed robustness at 200k.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/flux9_study.py
"""

import json
import sys
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

RUNS = [
    ("cosine_1M", {"optimizer.lr_schedule": "cosine"}, 1_000_000),
    ("cosine_s7", {"optimizer.lr_schedule": "cosine", "train.seed": 7},
     200_000),
    ("cosine_s99", {"optimizer.lr_schedule": "cosine", "train.seed": 99},
     200_000),
]


def run(tag, overrides, epochs):
    base = {
        "train.epochs": epochs,
        "train.chunk": 250,
        "train.log_every": 0,
        "optimizer.schedule_epochs": epochs,
    }
    base.update(overrides)
    exp = override(get_preset("euler_weak"), base)
    t0 = time.time()
    state, s = Trainer(exp).train()
    rec = {
        "tag": tag,
        "epochs": epochs,
        "wall_s": round(time.time() - t0, 1),
        **{k: round(v, 4) for k, v in s.items() if k.startswith("rel_l2")},
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    only = set(sys.argv[1:])
    print("# flux9 cosine-LR promotion study", flush=True)
    for tag, ov, ep in RUNS:
        if only and tag not in only:
            continue
        run(tag, ov, ep)


if __name__ == "__main__":
    main()
