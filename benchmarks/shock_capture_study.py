#!/usr/bin/env python
"""Shock-capture formulation study (round 2; follows PARITY §4b/§4c).

The two open problems in the reference's suite are shock cases where the
strong-form residual fails: the TwoSin inviscid flagship (clock-corrected
floor 0.037, best frozen-coefficient run 0.418 — PARITY §4b) and the Euler
u-field plateau (~0.21 under every optimization lever — PARITY §4c). This
study scans the two formulation-level remedies added to LossConfig:

- grad_weight_kappa (Mao et al., CMAME 2020): residual field damped by
  1/(1 + kappa*s^2) at steep gradients, so shock points stop dominating
  the loss; applied consistently through the ADMM prox/dual updates.
- entropy_weight: pointwise entropy-admissibility penalty
  mean(relu(U_t + F_x)^2), U = u^2/2, F = lambda1 u^3/3 (Burgers only) —
  selects the entropy solution among weak solutions.

Part A: clock-corrected TwoSin (pde.lambda1=0.377 — the PDE the stored grid
        actually satisfies in label time), 200k cosine Adam per cell.
Part B: euler_admm_tuned + kappa scan, 200k epochs per cell.
Winners rerun at the 1M-epoch envelope.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/shock_capture_study.py [epochs]
"""

import json
import sys
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

TWOSIN_BASE = {
    "pde.lambda1": 0.377,
    "optimizer.kind": "adam",
    "optimizer.lr_schedule": "cosine",
    "train.log_every": 0,
}

PART_A = [
    ("base_admm", {}),
    ("k1", {"loss.grad_weight_kappa": 1.0}),
    ("k10", {"loss.grad_weight_kappa": 10.0}),
    ("k100", {"loss.grad_weight_kappa": 100.0}),
    ("ent1", {"loss.entropy_weight": 1.0}),
    ("ent10", {"loss.entropy_weight": 10.0}),
    ("ms", {"loss.residual_kind": "mean_sq"}),
    ("ms_k10", {"loss.residual_kind": "mean_sq", "loss.grad_weight_kappa": 10.0}),
    ("k10_ent1", {"loss.grad_weight_kappa": 10.0, "loss.entropy_weight": 1.0}),
]

PART_B = [
    ("tuned", {}),
    ("tuned_k1", {"loss.grad_weight_kappa": 1.0}),
    ("tuned_k10", {"loss.grad_weight_kappa": 10.0}),
    ("tuned_k100", {"loss.grad_weight_kappa": 100.0}),
]


def run(preset, tag, overrides, epochs, extra_base=None):
    base = dict(extra_base or {})
    base.update({
        "train.epochs": epochs,
        # narrow TwoSin cells tolerate long chunks, but Part B shares this
        # base with the wide 5x200 Euler trunk — keep <= 250 (CLAUDE.md)
        "train.chunk": 250,
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

    print("# Part A: clock-corrected TwoSin", flush=True)
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

    print("# Part B: euler_admm_tuned + kappa", flush=True)
    res_b = [
        run("euler_admm_tuned", tag, ov, epochs,
            {"optimizer.kind": "adam"})
        for tag, ov in PART_B
    ]
    best_b = sorted(res_b, key=lambda r: r["rel_l2_u"])[:1]
    by_tag_b = dict(PART_B)
    print("# Part B winner at 1M:", [b["tag"] for b in best_b], flush=True)
    for b in best_b:
        run("euler_admm_tuned", b["tag"] + "_1M", by_tag_b[b["tag"]],
            1_000_000, {"optimizer.kind": "adam"})


if __name__ == "__main__":
    main()
