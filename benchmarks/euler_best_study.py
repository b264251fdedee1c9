#!/usr/bin/env python
"""Ensemble + L-BFGS tails + ground-truth-free selection on Euler
(VERDICT-r3 #3: close the forward u-gap).

The hybrid Adam->L-BFGS tail on euler_weak_fast reached the best
fast-budget numbers measured (rho/u/E .0208/.0453/.0142) on seed 1234 but
failed solo seed replication (u 0.176/0.105 on seeds 7/99 — PARITY §4o):
1-in-3 seeds improved. The shipped mitigation was "run several seeds and
pick the best", and every piece exists — ensembles run the FULL hybrid
schedule, and selection_scores ranks members WITHOUT ground truth (PARITY
§4p) — but the composed recipe was never measured.

This runs independent 8-member hybrid ensembles (disjoint seed blocks),
selects each run's best member by the ground-truth-free score, and reports
the selected member's TRUE rel-L2 next to the oracle-best member
(selection regret). Ship gate: if the median selected u beats the shipped
solo record (u 0.0544 @ 1M; fast-budget band 0.064-0.076), promote as
preset `euler_weak_best`.

The training + selection flow is shared with uq_front_study.py (the same
base-seed ensemble feeds both studies), so this is a thin wrapper over
r4_combo_study.py running only the euler_best half. Solo-tails is the
DEFAULT: the vmapped wide-net L-BFGS program is a fresh pathological
remote compile (~60+ min observed on 8x200); --vmapped opts into the
one-program variant explicitly.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/euler_best_study.py \
      [base_seeds...] [--vmapped] [--toy] [--resume]
Writes benchmarks/results/r4_euler_best.jsonl. The first base seed must be
the preset seed (1234) to reuse the shared checkpointed ensemble; other
seeds train fresh.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import r4_combo_study as combo  # noqa: E402

if __name__ == "__main__":
    args = sys.argv[1:]
    vmapped = "--vmapped" in args
    toy = "--toy" in args
    resume = "--resume" in args
    args = [a for a in args if not a.startswith("--")]
    if toy:  # CPU flush-test of the whole path at toy scale
        import jax

        jax.config.update("jax_platforms", "cpu")
        combo.BEST_OUT = combo.BEST_OUT.replace(".jsonl", "_toy.jsonl")
        combo.CKPT = combo.CKPT.replace(".ckpt", "_toy.ckpt")
    bases = [int(s) for s in args] or [1234, 7000, 99000]
    # the preset-seed block is the shared (checkpointable) ensemble; any
    # other bases run as independent replications
    base0 = 1234
    skip_base = base0 not in bases
    extra = [b for b in bases if b != base0]
    combo.main(extra, resume=resume, toy=toy, skip_base=skip_base,
               halves=("best",), vmapped=vmapped)
