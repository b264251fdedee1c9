#!/usr/bin/env python
"""Dissipation-matched weak-form study (round 2, follow-up to flux4_study).

flux4 showed the twosin_weak 0.0745 plateau is robust to capacity,
resolution, quadrature, and precision. The remaining 2x gap to the oracle
floor (0.037) has a candidate explanation in PARITY §2: the stored TwoSin
grid shows mild numerical dissipation (~nu ~ 1e-3 consistent with its DG
provenance), while the inviscid weak form converges to the SHARP entropy
solution. Fitting the dissipation the data actually has — a small viscous
flux term -lambda2 u_x on the cell edges — should close the gap if the
hypothesis is right, and leave it if not.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/flux5_study.py
"""

import json
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

CELLS = [
    ("nu5e-4", {"pde.lambda2": 5e-4}),
    ("nu1e-3", {"pde.lambda2": 1e-3}),
    ("nu2e-3", {"pde.lambda2": 2e-3}),
    ("nu3e-3", {"pde.lambda2": 3e-3}),
]


def run(tag, overrides, epochs=200_000):
    base = {
        "train.epochs": epochs,
        "train.chunk": 250,
        "train.log_every": 0,
        "optimizer.schedule_epochs": epochs,
    }
    base.update(overrides)
    exp = override(get_preset("twosin_weak"), base)
    t0 = time.time()
    _, s = Trainer(exp).train()
    rec = {
        "tag": tag,
        "epochs": epochs,
        "wall_s": round(time.time() - t0, 1),
        "rel_l2_u": round(s["rel_l2_u"], 4),
    }
    print(json.dumps(rec), flush=True)
    return rec


def run_euler(tag, overrides, epochs):
    base = {
        "train.epochs": epochs,
        "train.chunk": 250,
        "train.log_every": 0,
    }
    base.update(overrides)
    exp = override(get_preset("euler_weak"), base)
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
    print("# Dissipation-matched weak form (twosin_weak + small lambda2)",
          flush=True)
    res = [run(tag, ov) for tag, ov in CELLS]
    best = min(res, key=lambda r: r["rel_l2_u"])
    print(f"# best: {best['tag']}", flush=True)
    # seed-check the winner (the causal/flux recipe has real seed spread)
    by_tag = dict(CELLS)
    for seed in (7, 99):
        run(best["tag"] + f"_s{seed}",
            {**by_tag[best["tag"]], "train.seed": seed})

    # Euler follow-ups from flux4: linear (degree-1) wave paths improved u
    # at 200k (0.175 vs 0.211); default matmul precision is 4.4x faster at
    # near-parity — measure both at the 1M envelope.
    print("# Euler follow-ups at 1M", flush=True)
    run_euler("deg1_p3_1M", {"model.path_degree": 1, "model.n_paths": 3},
              1_000_000)
    run_euler("prec_default_1M", {"model.precision": "default"}, 1_000_000)


if __name__ == "__main__":
    main()
