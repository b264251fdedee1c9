#!/usr/bin/env python
"""Abgrall matched-dissipation follow-up (round 4).

The first r4 pass (abgrall_visc_study.py -> r4_abgrall_visc.jsonl) measured:
  hl2_visc 0.0784 (inviscid 0.101), al1_visc 0.286 (no change),
  al2_visc 0.0119 (inviscid 0.235 — 20x), al2_visc_cos200k 0.0117,
  abg_ident lambda1=1.0017 nu=4.77e-3 rel-L2 0.0031 (PINN-side check of the
  FD-identified oracle).

This follow-up supplies the ship-evidence VERDICT-r3 #1 asks for:
  - seed replication of the al2 winner (seeds 7/99; 1234 already measured),
  - L-BFGS tails (the reference's own hybrid schedule) on all three presets,
  - budget-scaled cosine cells for the two laggards, to separate
    budget-bound from mechanism-bound.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/abgrall_visc_followup.py [tags]
"""

import json
import sys
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

NU = 4.8e-3  # identified (PARITY §2, benchmarks/abgrall_ident.py)

RUNS = [
    # seed replication of the winner
    ("al2_visc_s7", "abgrall_l2",
     {"pde.lambda2": NU, "train.seed": 7}, 100_000),
    ("al2_visc_s99", "abgrall_l2",
     {"pde.lambda2": NU, "train.seed": 99}, 100_000),
    # L-BFGS tails (reference hybrid schedule: Adam -> L-BFGS at 50k)
    ("al2_visc_hybrid", "abgrall_l2",
     {"pde.lambda2": NU, "optimizer.kind": "hybrid",
      "optimizer.switch_epoch": 50_000}, 100_050),
    ("hl2_visc_hybrid", "hwan_l2",
     {"pde.lambda2": NU, "optimizer.kind": "hybrid",
      "optimizer.switch_epoch": 50_000}, 100_050),
    ("al1_visc_hybrid", "abgrall_l1",
     {"pde.lambda2": NU, "optimizer.kind": "hybrid",
      "optimizer.switch_epoch": 50_000}, 100_050),
    # budget-scaled cosine cells for the laggards
    ("hl2_visc_cos200k", "hwan_l2",
     {"pde.lambda2": NU, "optimizer.lr_schedule": "cosine",
      "optimizer.schedule_epochs": 200_000}, 200_000),
    ("al1_visc_cos200k", "abgrall_l1",
     {"pde.lambda2": NU, "optimizer.lr_schedule": "cosine",
      "optimizer.schedule_epochs": 200_000}, 200_000),
]


def run(tag, preset, overrides, epochs):
    base = {"train.epochs": epochs, "train.log_every": 0}
    base.update(overrides)
    exp = override(get_preset(preset), base)
    t0 = time.time()
    state, s = Trainer(exp).train()
    rec = {
        "tag": tag,
        "epochs": epochs,
        "wall_s": round(time.time() - t0, 1),
        **{k: round(float(v), 5) for k, v in s.items()
           if "rel_l2" in k or k in ("lambda1", "lambda2")},
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    only = set(sys.argv[1:])
    print("# Abgrall matched-dissipation follow-up (seeds + tails + budget)",
          flush=True)
    for tag, preset, ov, ep in RUNS:
        if only and tag not in only:
            continue
        run(tag, preset, ov, ep)


if __name__ == "__main__":
    main()
