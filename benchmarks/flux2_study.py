#!/usr/bin/env python
"""Weak-form composition study (round 2, follow-up to flux_study).

flux_study found two independent breakthrough levers on the clock-corrected
TwoSin shock (strong-form plateau 0.398/0.384): flux+causal10 -> 0.1429 and
flux+paths -> 0.1448 (the weak form finally lets the path fronts SHARPEN,
a 8 -> 15). This study composes them and probes the remaining knobs (cell
size, causality strength, sharper init, entropy weight) toward the 0.037
oracle floor (PARITY §2).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/flux2_study.py [epochs]
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

P2 = {"model.n_paths": 2, "model.path_sharpness": 12.0}

CELLS = [
    ("fc10_p2", {"loss.causal_eps": 10.0, **P2}),
    ("fc10_small", {"loss.causal_eps": 10.0, "loss.flux_dx_frac": 0.01,
                    "loss.flux_dt_frac": 0.01}),
    ("fc30", {"loss.causal_eps": 30.0}),
    ("fc10_ent01", {"loss.causal_eps": 10.0, "loss.entropy_weight": 0.1}),
    ("fc10_sharp25", {"loss.causal_eps": 10.0, "model.n_paths": 2,
                      "model.path_sharpness": 25.0}),
    ("fc10_p2_small", {"loss.causal_eps": 10.0, "loss.flux_dx_frac": 0.01,
                       "loss.flux_dt_frac": 0.01, **P2}),
    ("admm_flux", {"loss.residual_kind": "admm", "loss.admm_form": "flux"}),
    ("admm_flux_c0", {"loss.residual_kind": "admm",
                      "loss.admm_form": "flux",
                      "loss.admm_update_points": "current"}),
]


def run(preset, tag, overrides, epochs, extra_base=None):
    base = dict(extra_base or {})
    base.update({
        "train.epochs": epochs,
        "train.chunk": 250,
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


EULER_BASE = {"optimizer.kind": "adam"}

# Euler: flux_study found ADMM carries rho (0.065 vs 0.087-0.196 without)
# while the weak form carries u (0.195 vs the 0.21 plateau) — compose them
# with loss.admm_form='flux' (the reference's ADMM machinery over weak-form
# cell residuals).
EULER_CELLS = [
    ("admm_flux", {"loss.residual_kind": "admm", "loss.admm_form": "flux"}),
    ("admm_flux_ent01", {"loss.residual_kind": "admm",
                         "loss.admm_form": "flux",
                         "loss.entropy_weight": 0.1}),
    ("admm_flux_small", {"loss.residual_kind": "admm",
                         "loss.admm_form": "flux",
                         "loss.flux_dx_frac": 0.01,
                         "loss.flux_dt_frac": 0.01}),
]


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

    print("# Weak-form composition: clock-corrected TwoSin", flush=True)
    res = [run("abgrall_admm", tag, ov, epochs, TWOSIN_BASE)
           for tag, ov in CELLS]
    best = sorted(res, key=lambda r: r["rel_l2_u"])[:2]
    by_tag = dict(CELLS)
    print("# winners at 500k:", [b["tag"] for b in best], flush=True)
    for b in best:
        run("abgrall_admm", b["tag"] + "_500k", by_tag[b["tag"]],
            500_000, TWOSIN_BASE)

    print("# Euler: ADMM over weak-form residuals", flush=True)
    res_b = [run("euler_admm_tuned", tag, ov, epochs, EULER_BASE)
             for tag, ov in EULER_CELLS]
    best_b = sorted(res_b, key=lambda r: r["rel_l2_u"])[:1]
    by_tag_b = dict(EULER_CELLS)
    print("# Euler winner at 1M:", [b["tag"] for b in best_b], flush=True)
    for b in best_b:
        run("euler_admm_tuned", b["tag"] + "_1M", by_tag_b[b["tag"]],
            1_000_000, EULER_BASE)


if __name__ == "__main__":
    main()
