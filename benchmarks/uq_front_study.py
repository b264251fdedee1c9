#!/usr/bin/env python
"""Front-aware Mondrian conformal on the real Euler ensemble (VERDICT-r3 #6).

Round 3 measured the std-binned Mondrian estimator under-covering the rho
shock (cov_mond95_shock .847 vs the .95 target — PARITY §4n): the ensemble
std does not resolve the rho front. Round 4 added a front-aware taxonomy —
bin on the predicted |d(field)/dx| (serving-time computable; ensemble
artifacts export it as `{name}_dx`). This study trains the same 8-member
euler_weak_fast ensemble as round 3 (Adam-only cosine-200k, the shipped
recipe) and grades BOTH estimators on the same members, then exports the
dx-calibrated artifact into benchmarks/results/r4_artifacts/ so future
rounds can re-grade without retraining.

Done criterion: cov_mond95_shock >= .90 on rho with cov_mond95 >= .95 held.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/uq_front_study.py [--toy]
Writes benchmarks/results/r4_uq_front.jsonl.
"""

import json
import os
import sys
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.parallel.ensemble import run_ensemble, uq_calibration
from pinns_tpu.serve import export_ensemble
from pinns_tpu.train import Trainer

OUT = "benchmarks/results/r4_uq_front.jsonl"
ART = "benchmarks/results/r4_artifacts"


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _round4(v):
    if isinstance(v, list):
        return [round(float(x), 4) for x in v]
    return v if isinstance(v, str) else round(float(v), 4)


def main(toy=False):
    ov = {"train.log_every": 0}
    if toy:
        ov.update({
            "model.layers": (2, 12, 12, 3), "sampling.n_f": 128,
            "train.epochs": 200, "train.chunk": 100,
            "sampling.t_curriculum_epochs": 0,
        })
    exp = override(get_preset("euler_weak_fast"), ov)
    tr = Trainer(exp)
    seeds = [exp.train.seed + i for i in range(8)]
    t0 = time.time()
    stacked, summaries = run_ensemble(tr, seeds)
    emit({
        "tag": "euler_ens8", "wall_s": round(time.time() - t0, 1),
        "members": [
            {k: round(float(v), 4) for k, v in s.items() if "rel_l2" in k}
            for s in summaries
        ],
    })
    for feature in ("std", "dx"):
        cal = uq_calibration(tr, stacked, mond_feature=feature)
        emit({"tag": f"calibration_{feature}", **{
            f: {k: _round4(v) for k, v in row.items()}
            for f, row in cal.items()
        }})
        if feature == "dx":
            os.makedirs(ART, exist_ok=True)
            path = export_ensemble(
                tr, stacked.params,
                os.path.join(ART, "euler_ens8_dx"), calibration=cal,
            )
            emit({"tag": "artifact", "path": path})


if __name__ == "__main__":
    toy = "--toy" in sys.argv
    if toy:  # CPU flush-test of the whole path at toy scale
        import jax

        jax.config.update("jax_platforms", "cpu")
        OUT = OUT.replace(".jsonl", "_toy.jsonl")
    main(toy=toy)
