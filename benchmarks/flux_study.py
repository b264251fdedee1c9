#!/usr/bin/env python
"""Weak-form flux-residual study (round 2; follows the path/causal studies).

The path study (PARITY §4g) showed the optimizer actively SMOOTHS sharp
fronts under the strong-form residual (front sharpness decays; the
residual is undefined at a jump and grows as fronts sharpen). The weak-form
control-volume residual (LossConfig.residual_kind='flux', ops/weakform.py)
is the formulation fix: discontinuous weak solutions satisfy the integral
conservation law exactly, and the weak entropy inequality (entropy_weight)
selects the admissible one. This study measures it on both open problems,
alone and composed with the trainable shock paths (which the weak form
finally lets sharpen) and causal weighting.

Part A: clock-corrected TwoSin (pde.lambda1=0.377). Part B: Euler
(euler_admm_tuned data weights/curriculum, residual switched to flux),
ranked by the u-field (the contact plateau). Winners rerun at 1M.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/flux_study.py [epochs]
"""

import json
import sys
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

TWOSIN_BASE = {
    "pde.lambda1": 0.377,
    "loss.residual_kind": "flux",
    "optimizer.kind": "adam",
    "optimizer.lr_schedule": "cosine",
}

PART_A = [
    ("flux", {}),
    ("flux_small", {"loss.flux_dx_frac": 0.01, "loss.flux_dt_frac": 0.01}),
    ("flux_ent1", {"loss.entropy_weight": 1.0}),
    ("flux_causal10", {"loss.causal_eps": 10.0}),
    ("flux_p2", {"model.n_paths": 2, "model.path_sharpness": 12.0}),
    ("flux_ent1_p2", {"loss.entropy_weight": 1.0, "model.n_paths": 2,
                      "model.path_sharpness": 12.0}),
    ("flux_ent1_causal10", {"loss.entropy_weight": 1.0,
                            "loss.causal_eps": 10.0}),
]

EULER_BASE = {
    "loss.residual_kind": "flux",
    "optimizer.kind": "adam",
}

PART_B = [
    ("flux", {}),
    ("flux_ent01", {"loss.entropy_weight": 0.1}),
    ("flux_ent1", {"loss.entropy_weight": 1.0}),
    ("flux_p2", {"model.n_paths": 2, "model.path_sharpness": 12.0}),
    ("flux_causal1", {"loss.causal_eps": 1.0}),
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
    state, s = Trainer(exp).train()
    rec = {
        "tag": tag,
        "epochs": epochs,
        "wall_s": round(time.time() - t0, 1),
        **{k: round(v, 4) for k, v in s.items() if k.startswith("rel_l2")},
    }
    if exp.model.n_paths:
        import numpy as np

        layer0 = state.params["net"][0]
        rec["path_c"] = np.asarray(layer0["path_c"]).round(3).tolist()
        rec["path_a"] = np.asarray(layer0["path_a"]).round(2).tolist()
    print(json.dumps(rec), flush=True)
    return rec


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

    print("# Part A: clock-corrected TwoSin + weak-form flux", flush=True)
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

    print("# Part B: Euler + weak-form flux", flush=True)
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
