#!/usr/bin/env python
"""Causal-in-time residual weighting study (round 2; follows PARITY §4d).

Wang, Sankaran & Perdikaris (2022) argue PINN failures on evolution problems
are training-dynamics failures: the residual at late times is minimized
before early times are fit, locking in wrong downstream solutions. Their
remedy — weight bin b's residual by exp(-eps * cumulative earlier-bin loss)
— is the one standard shock remedy not yet measured on this suite
(grad-weighting, entropy penalties, RAD, Fourier features are all measured
negatives, PARITY §4d/§4e; the time-marching curriculum helped Euler).

Part A: clock-corrected TwoSin (pde.lambda1=0.377), mean_sq residual
        (measured best formulation), eps scan x paths composition.
Part B: euler_admm_tuned switched to mean_sq + causal (the ADMM penalty is
        incompatible with per-bin weighting) — also measures mean_sq-vs-ADMM
        on Euler as a side product.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/causal_study.py [epochs]
"""

import json
import sys
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

TWOSIN_BASE = {
    "pde.lambda1": 0.377,
    "loss.residual_kind": "mean_sq",
    "optimizer.kind": "adam",
    "optimizer.lr_schedule": "cosine",
}

PART_A = [
    ("eps01", {"loss.causal_eps": 0.1}),
    ("eps1", {"loss.causal_eps": 1.0}),
    ("eps10", {"loss.causal_eps": 10.0}),
    ("eps100", {"loss.causal_eps": 100.0}),
    ("eps1_p2", {"loss.causal_eps": 1.0, "model.n_paths": 2,
                 "model.path_sharpness": 12.0}),
    ("eps10_p2", {"loss.causal_eps": 10.0, "model.n_paths": 2,
                  "model.path_sharpness": 12.0}),
]

EULER_BASE = {
    "optimizer.kind": "adam",
    "loss.residual_kind": "mean_sq",
}

PART_B = [
    ("ms_base", {}),
    ("eps1", {"loss.causal_eps": 1.0}),
    ("eps10", {"loss.causal_eps": 10.0}),
]


def run(preset, tag, overrides, epochs, extra_base=None):
    base = dict(extra_base or {})
    base.update({
        "train.epochs": epochs,
        "train.chunk": 250,  # wide-net remote-compile limit (CLAUDE.md)
        "train.log_every": 0,
        "optimizer.schedule_epochs": epochs,
    })
    base.update(overrides)
    exp = override(get_preset(preset), base)
    t0 = time.time()
    _, s = Trainer(exp).train()
    rec = {
        "tag": tag,
        "epochs": epochs,
        "wall_s": round(time.time() - t0, 1),
        **{k: round(v, 4) for k, v in s.items() if k.startswith("rel_l2")},
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

    print("# Part A: clock-corrected TwoSin + causal weighting", flush=True)
    res_a = [
        run("abgrall_admm", tag, ov, epochs, TWOSIN_BASE)
        for tag, ov in PART_A
    ]
    best_a = sorted(res_a, key=lambda r: r["rel_l2_u"])[:2]
    by_tag_a = dict(PART_A)
    print("# Part A winners at 1M:", [b["tag"] for b in best_a], flush=True)
    for b in best_a:
        run("abgrall_admm", b["tag"] + "_1M", by_tag_a[b["tag"]],
            1_000_000, TWOSIN_BASE)

    print("# Part B: Euler mean_sq + causal", flush=True)
    res_b = [
        run("euler_admm_tuned", tag, ov, epochs, EULER_BASE)
        for tag, ov in PART_B
    ]
    best_b = sorted(res_b, key=lambda r: r["rel_l2_u"])[:1]
    by_tag_b = dict(PART_B)
    print("# Part B winner at 1M:", [b["tag"] for b in best_b], flush=True)
    for b in best_b:
        run("euler_admm_tuned", b["tag"] + "_1M", by_tag_b[b["tag"]],
            1_000_000, EULER_BASE)


if __name__ == "__main__":
    main()
