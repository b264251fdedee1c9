#!/usr/bin/env python
"""L-BFGS lock-in on the MATCHED recipes (round 2, follow-up to flux5/flux9).

flux3 measured L-BFGS lock-in as a negative on the INVISCID causal TwoSin
recipe (0.140 vs 0.0745): the sharp inviscid objective is badly conditioned
at the front. The shipped recipes have since changed character — both now
match the dataset's identified dissipation (twosin_weak lambda2=1e-3,
euler_weak nu=1e-3), which PARITY 4k showed collapses the seed spread
because the objective is far better conditioned. A quasi-Newton tail is
exactly the move for a well-conditioned converged basin, so the negative
deserves a re-test on the matched objectives.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/lockin_study.py [tags]
"""

import json
import sys
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

LOCKIN = {
    "optimizer.kind": "hybrid",
    "optimizer.switch_epoch": 200_000,
    "optimizer.schedule_epochs": 200_000,
}

RUNS = [
    # TwoSin matched recipe + L-BFGS tail (50 outer epochs)
    ("ts_lockin", "twosin_weak", LOCKIN, 200_050),
    # Euler fast-budget recipe (cosine 200k) + L-BFGS tail
    ("eu_fast_lockin", "euler_weak",
     {**LOCKIN, "optimizer.lr_schedule": "cosine", "train.chunk": 250},
     200_050),
    # Round-3 follow-ups (run by tag from the queue's last leg):
    # seeds 7/99 of the winning Euler hybrid cell — 3-seed evidence before
    # promoting the recipe beyond a preset-comment override (PARITY 4o)
    ("eu_fast_lockin_s7", "euler_weak",
     {**LOCKIN, "optimizer.lr_schedule": "cosine", "train.chunk": 250,
      "train.seed": 7}, 200_050),
    ("eu_fast_lockin_s99", "euler_weak",
     {**LOCKIN, "optimizer.lr_schedule": "cosine", "train.chunk": 250,
      "train.seed": 99}, 200_050),
    # 200k-solo attribution cell for the 4o precision verdict: same recipe
    # as eu_fast (Adam-only) but precision='default' — pins that the
    # ensemble/1M collapse is the precision lever, not vmap or schedule
    ("eu_fast_precdefault", "euler_weak",
     {"optimizer.lr_schedule": "cosine", "optimizer.schedule_epochs": 200_000,
      "train.chunk": 250, "model.precision": "default"}, 200_000),
    # Round-3 late cells: the tail on the 1M constant-LR envelope (the
    # shipped euler_weak recipe, best-known .0205/.0544/.0162). The 200k
    # cosine tail was seed-flaky (PARITY 4o: 1-in-3 seeds improved); the
    # 1M basin is 5x longer-trained — measure whether the quasi-Newton
    # polish is stable there before writing the tail off entirely.
    ("eu_1m_lockin", "euler_weak",
     {"optimizer.kind": "hybrid", "optimizer.switch_epoch": 1_000_000,
      "train.chunk": 250}, 1_000_050),
    ("eu_1m_lockin_s7", "euler_weak",
     {"optimizer.kind": "hybrid", "optimizer.switch_epoch": 1_000_000,
      "train.chunk": 250, "train.seed": 7}, 1_000_050),
    ("eu_1m_lockin_s99", "euler_weak",
     {"optimizer.kind": "hybrid", "optimizer.switch_epoch": 1_000_000,
      "train.chunk": 250, "train.seed": 99}, 1_000_050),
    # Adam-only seed controls for the 1M tail attribution (seed 1234's
    # control is the canonical .0205/.0544/.0162 envelope run)
    ("eu_1m_adam_s7", "euler_weak",
     {"train.chunk": 250, "train.seed": 7}, 1_000_000),
    ("eu_1m_adam_s99", "euler_weak",
     {"train.chunk": 250, "train.seed": 99}, 1_000_000),
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
        **{k: round(float(v), 4) for k, v in s.items()
           if "rel_l2" in k},
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    only = set(sys.argv[1:])
    print("# L-BFGS lock-in on matched recipes", flush=True)
    for tag, preset, ov, ep in RUNS:
        if only and tag not in only:
            continue
        run(tag, preset, ov, ep)


if __name__ == "__main__":
    main()
