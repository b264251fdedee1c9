#!/usr/bin/env python
"""Front-aware Mondrian conformal on the real Euler ensemble (VERDICT-r3 #6).

Round 3 measured the std-binned Mondrian estimator under-covering the rho
shock (cov_mond95_shock .847 vs the .95 target — PARITY §4n): the ensemble
std does not resolve the rho front. Round 4 added a front-aware taxonomy —
bin on the predicted |d(field)/dx| (serving-time computable; ensemble
artifacts export it as `{name}_dx`). This grades BOTH estimators on the
same 8-member euler_weak_fast ensemble (Adam-only cosine-200k, the shipped
recipe) and exports the dx-calibrated artifact into
benchmarks/results/r4_artifacts/ so future rounds can re-grade without
retraining.

Done criterion: cov_mond95_shock >= .90 on rho with cov_mond95 >= .95 held.

The training + calibration flow is shared with euler_best_study.py (the
same ensemble feeds both studies), so this is a thin wrapper over
r4_combo_study.py running only the UQ half; the trained ensemble is
checkpointed and reused across the two studies and across crashes.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/uq_front_study.py \
      [--toy] [--resume]
Writes benchmarks/results/r4_uq_front.jsonl.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import r4_combo_study as combo  # noqa: E402

if __name__ == "__main__":
    toy = "--toy" in sys.argv
    if toy:  # CPU flush-test of the whole path at toy scale
        import jax

        jax.config.update("jax_platforms", "cpu")
        combo.UQ_OUT = combo.UQ_OUT.replace(".jsonl", "_toy.jsonl")
        combo.CKPT = combo.CKPT.replace(".ckpt", "_toy.ckpt")
    combo.main([], resume="--resume" in sys.argv, toy=toy, halves=("uq",))
