#!/usr/bin/env python
"""Weak-form frontier study (round 2, follow-up to flux2_study).

flux2 found (clock-corrected TwoSin): flux+causal eps=30 -> 0.0745 @ 200k
(floor 0.037) but DRIFTS at 500k (0.118; sharp25 collapses to 0.46) — as
residuals vanish the causal weights all -> 1 and the selection pressure
disappears. This study (a) extends the eps scan, (b) tests PERSISTENT
selectors (weak entropy inequality; L-BFGS lock-in after the causal Adam
phase), (c) pushes the Euler rho/u frontier (strong-ADMM rho 0.060/u 0.213;
flux u 0.191/rho 0.104; admm_flux rho 0.072/u 0.222).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/flux3_study.py
"""

import json
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

P2S25 = {"model.n_paths": 2, "model.path_sharpness": 25.0}

# (tag, overrides, epochs)
PART_A = [
    ("fc20", {"loss.causal_eps": 20.0}, 200_000),
    ("fc50", {"loss.causal_eps": 50.0}, 200_000),
    ("fc100", {"loss.causal_eps": 100.0}, 200_000),
    ("fc30_ent01", {"loss.causal_eps": 30.0, "loss.entropy_weight": 0.1},
     200_000),
    ("fc30_p2s25", {"loss.causal_eps": 30.0, **P2S25}, 200_000),
    # L-BFGS lock-in: causal Adam to 200k, then on-device L-BFGS outer
    # epochs on the same (causally weighted) objective
    ("fc30_lbfgs", {"loss.causal_eps": 30.0, "optimizer.kind": "hybrid",
                    "optimizer.switch_epoch": 200_000,
                    "optimizer.schedule_epochs": 200_000}, 200_050),
]

EULER_BASE = {"optimizer.kind": "adam"}

PART_B = [
    # push u with paths while recovering rho with a stronger data weight
    ("flux_p2_w5", {"loss.residual_kind": "flux", "model.n_paths": 2,
                    "model.path_sharpness": 12.0,
                    "loss.data_field_weights": (5.0, 1.0, 1.0)}, 200_000),
    ("admm_flux_p2", {"loss.residual_kind": "admm", "loss.admm_form": "flux",
                      "model.n_paths": 2, "model.path_sharpness": 12.0},
     200_000),
    ("flux_p2_w5_1M", {"loss.residual_kind": "flux", "model.n_paths": 2,
                       "model.path_sharpness": 12.0,
                       "loss.data_field_weights": (5.0, 1.0, 1.0)},
     1_000_000),
]


def run(preset, tag, overrides, epochs, extra_base=None):
    base = dict(extra_base or {})
    base.update({
        "train.epochs": epochs,
        "train.chunk": 250,
        "train.log_every": 0,
    })
    base.setdefault("optimizer.schedule_epochs", epochs)
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
    print("# Part A: TwoSin weak-form frontier", flush=True)
    for tag, ov, ep in PART_A:
        run("abgrall_admm", tag, ov, ep, TWOSIN_BASE)

    print("# Part B: Euler rho/u frontier", flush=True)
    for tag, ov, ep in PART_B:
        run("euler_admm_tuned", tag, ov, ep, EULER_BASE)


if __name__ == "__main__":
    main()
