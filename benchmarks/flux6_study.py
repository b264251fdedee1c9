#!/usr/bin/env python
"""Euler dissipation-matching study (round 2, follow-up to flux5_study).

flux5 closed the TwoSin gap to the oracle floor by identifying the stored
grid's own numerical dissipation (lambda2 ~ 1e-3) and freezing it into the
weak-form recipe (PARITY §4k). The stored Euler grid is ALSO a dissipative
numerical solution (DG, validated <5%/field vs our FV oracle, PARITY §2),
so the same move should apply: the weak-form Euler flux now carries an
artificial-viscosity term -nu dU_i/dx on the conserved variables
(pde.lambda2 slot, ops/weakform.py euler_flux_residuals).

Part A identifies nu from 2000 interior points of the stored grid
(train_coeffs + exp transform, weak form — the strong form has no Euler
dissipation term by construction). Part B freezes a nu grid around the
identified value into euler_weak at 200k; Part C promotes the winner to
the 1M envelope.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/flux6_study.py
"""

import json
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

ID_BASE = {
    "pde.train_coeffs": True,
    "pde.lambda2": -6.0,
    "pde.lambda2_transform": "exp",
    "loss.residual_kind": "flux",
    "data.selection": "interior",
    "data.n_u": 2000,
    "optimizer.kind": "adam",
    "optimizer.lr_schedule": "cosine",
}

# (tag, overrides, epochs) on euler_admm (identification mode)
PART_A = [
    ("id_flux", {}, 200_000),
    ("id_flux_paths", {"model.n_paths": 2, "model.path_degree": 1}, 200_000),
]

# (tag, overrides, epochs) on euler_weak (frozen nu)
PART_B = [
    ("nu5e-4", {"pde.lambda2": 5e-4}, 200_000),
    ("nu1e-3", {"pde.lambda2": 1e-3}, 200_000),
    ("nu2e-3", {"pde.lambda2": 2e-3}, 200_000),
    ("nu5e-3", {"pde.lambda2": 5e-3}, 200_000),
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
    for k in ("lambda1", "lambda2"):
        if s.get(k) is not None and exp.pde.train_coeffs:
            rec[k] = round(float(s[k]), 6)
    print(json.dumps(rec), flush=True)
    return rec


def main():
    print("# Part A: Euler dissipation identification (weak form)",
          flush=True)
    for tag, ov, ep in PART_A:
        run("euler_admm", tag, ov, ep, ID_BASE)

    print("# Part B: euler_weak with frozen artificial viscosity",
          flush=True)
    for tag, ov, ep in PART_B:
        run("euler_weak", tag, ov, ep)


if __name__ == "__main__":
    main()
