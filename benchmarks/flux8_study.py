#!/usr/bin/env python
"""Euler mix_mass refinement study (round 2, follow-up to flux7_study).

flux7 found the mixed formulation (strong mass + weak momentum/energy,
loss.strong_equations=(0,), nu=1e-3): rho/u/E 2.6%/8.0%/2.1% at 200k —
better on every field than the 1M shipped euler_weak. Momentum (u 8%) is
now the weak field. This study sweeps the remaining levers around the
winner at the 200k budget:

- causal-in-time weighting (the TwoSin breakthrough lever, never tried on
  the Euler mix),
- data-weight retune (the (5,1,1) rho upweight predates the mix — maybe
  momentum deserves the weight now),
- nu refinement around 1e-3.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/flux8_study.py
"""

import json
import sys
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

MIX = {"loss.strong_equations": (0,), "pde.lambda2": 1e-3}

RUNS = [
    # cosine LR decay: the TwoSin identification difference-maker (§4k),
    # never tried on the Euler forward recipe (all rows above: constant LR)
    ("cosine", {**MIX, "optimizer.lr_schedule": "cosine"}, 200_000),
    ("causal10", {**MIX, "loss.causal_eps": 10.0}, 200_000),
    ("causal30", {**MIX, "loss.causal_eps": 30.0}, 200_000),
    ("w111", {**MIX, "loss.data_field_weights": (1.0, 1.0, 1.0)}, 200_000),
    ("w151", {**MIX, "loss.data_field_weights": (1.0, 5.0, 1.0)}, 200_000),
    ("nu5e-4", {**MIX, "pde.lambda2": 5e-4}, 200_000),
    ("nu2e-3", {**MIX, "pde.lambda2": 2e-3}, 200_000),
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
    print("# flux8 mix_mass refinement study", flush=True)
    for tag, ov, ep in RUNS:
        if only and tag not in only:
            continue
        run(tag, ov, ep)


if __name__ == "__main__":
    main()
