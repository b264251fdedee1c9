#!/usr/bin/env python
"""RAD sampling quality study: preset defaults vs strategy='rad'.

Residual-based adaptive sampling (SamplingConfig strategy='rad') re-draws
the collocation batch at chunk boundaries by importance-sampling a uniform
pool with p ∝ |f|/mean|f| + c. This study measures it against each viscous
Burgers preset's default sampling at the reference budget — the configs
where residual structure is smooth enough for importance weights to help
(the inviscid shock cases are covered by shock_capture_study.py, where
formulation, not sampling, is the bottleneck).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/rad_study.py [epochs]
"""

import json
import sys
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

CASES = [
    # (preset, epochs, extra overrides)
    ("hwan_l2", 100_000, {}),
    ("abgrall_l1", 100_000, {}),
    ("abgrall_l2", 100_000, {}),
    ("burgers_batch_l1sq", 100_000, {}),
    ("burgers_admm_batch", 100_000, {}),
    ("burgers_forward", 200_000, {"optimizer.kind": "adam"}),
]

RAD = {
    "sampling.strategy": "rad",
    "sampling.rad_pool_factor": 8,
    "sampling.rad_k": 1.0,
    "sampling.rad_c": 1.0,
}


def run(preset, tag, overrides, epochs):
    base = {
        "train.epochs": epochs,
        "train.log_every": 0,
    }
    base.update(overrides)
    exp = override(get_preset(preset), base)
    t0 = time.time()
    _, s = Trainer(exp).train()
    rec = {
        "preset": preset,
        "tag": tag,
        "epochs": epochs,
        "wall_s": round(time.time() - t0, 1),
        "rel_l2_u": round(s["rel_l2_u"], 6),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    for preset, epochs, extra in CASES:
        if cap:
            epochs = min(epochs, cap)
        run(preset, "base", dict(extra), epochs)
        run(preset, "rad", dict(extra, **RAD), epochs)


if __name__ == "__main__":
    main()
