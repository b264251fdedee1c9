#!/usr/bin/env python
"""Weak-form floor-chasing study (round 2, follow-up to flux3_study).

Targets the remaining gaps of the shipped weak-form presets:
- TwoSin (twosin_weak = 0.0745; oracle floor 0.037): capacity (wider
  trunk), resolution (more cells), quadrature order, and flux matmul
  precision (the inviscid flux path has NO second derivatives, so the
  HIGHEST-precision requirement of the u_xx chain does not apply — lower
  precision may be free speed).
- Euler (euler_weak u 0.148): the Sod/Lax waves are STRAIGHT LINES in the
  x-t plane, so path_degree=1 is the physically right prior (and fewer
  parameters); more paths cover shock + contact + rarefaction edges.
- Identification: the reference's actual flagship mode (trainable
  lambda1/lambda2 from interior TwoSin data, label time) on the weak form.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/flux4_study.py
"""

import json
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

WIDE40 = (2,) + (40,) * 8 + (1,)

# (tag, overrides, epochs) on twosin_weak
PART_A = [
    ("wide40", {"model.layers": WIDE40}, 200_000),
    ("nf4000", {"sampling.n_f": 4000}, 200_000),
    ("quad6", {"loss.flux_quad": 6}, 200_000),
    ("prec_high", {"model.precision": "high"}, 200_000),
    ("prec_default", {"model.precision": "default"}, 200_000),
    ("wide40_nf4000", {"model.layers": WIDE40, "sampling.n_f": 4000},
     200_000),
]

# (tag, overrides, epochs) on euler_weak
PART_B = [
    ("deg1_p3", {"model.path_degree": 1, "model.n_paths": 3}, 200_000),
    ("deg1_p4", {"model.path_degree": 1, "model.n_paths": 4}, 200_000),
    ("sharp25", {"model.path_sharpness": 25.0}, 200_000),
    ("prec_default", {"model.precision": "default"}, 200_000),
]

# identification: reference flagship mode (PARITY §4b strong-form row:
# u 0.076, lambda1 0.324, lambda2 1.7e-3 from 2000 interior points)
PART_C = [
    ("id_strong", {}, 200_000),
    ("id_flux", {"loss.residual_kind": "flux"}, 200_000),
]

ID_BASE = {
    "pde.train_coeffs": True,
    "pde.lambda1": 0.0,
    "pde.lambda2": -6.0,
    "pde.lambda2_transform": "exp",
    "loss.residual_kind": "mean_sq",
    "data.selection": "interior",
    "data.n_u": 2000,
    "optimizer.kind": "adam",
    "optimizer.lr_schedule": "cosine",
}


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
    for k in ("lambda1", "lambda2"):
        if s.get(k) is not None and exp.pde.train_coeffs:
            rec[k] = round(float(s[k]), 5)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    print("# Part A: TwoSin floor chase (twosin_weak base)", flush=True)
    for tag, ov, ep in PART_A:
        run("twosin_weak", tag, ov, ep)

    print("# Part B: Euler wave-prior paths (euler_weak base)", flush=True)
    for tag, ov, ep in PART_B:
        run("euler_weak", tag, ov, ep)

    print("# Part C: TwoSin identification, label time", flush=True)
    for tag, ov, ep in PART_C:
        run("abgrall_admm", tag, ov, ep, ID_BASE)


if __name__ == "__main__":
    main()
