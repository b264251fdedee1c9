"""Deep-ensemble training + uncertainty quantification in one program.

The reference parallelizes independent runs as MPI farm jobs
(``scheduler.py:70-127``) and offers no uncertainty output; here E members
train as ONE vmapped XLA program (`run_ensemble`) and `ensemble_predict`
returns per-field mean/std over the members in a single call. SWA tail
averaging (`train.swa_frac`) additionally reports each member's averaged
iterate next to its final one.

    python examples/05_ensemble_uq.py [--quick]

Prints the per-member and SWA rel-L2 band, then the ensemble-mean
prediction's rel-L2 (usually at or below the best member) and the
correlation between predictive std and actual error — the UQ signal.
"""

import sys

import numpy as np

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.parallel.ensemble import (
    ensemble_predict,
    init_ensemble_states,
    run_ensemble,
)
from pinns_tpu.train import Trainer
from pinns_tpu.train.evaluate import relative_l2

exp = override(get_preset("abgrall_l2"), {"train.swa_frac": 0.25})
if "--quick" in sys.argv:
    exp = override(exp, {
        "model.layers": (2, 20, 20, 1),
        "train.epochs": 3000,
        "train.chunk": 500,
        "sampling.n_f": 1000,
    })

trainer = Trainer(exp)
seeds = [exp.train.seed + i for i in range(4)]
stacked, summaries = run_ensemble(trainer, seeds)

for i, s in enumerate(summaries):
    print(
        f"member {i} (seed {seeds[i]}): rel-L2 {s['rel_l2_u']:.3e}"
        f"  swa {s['swa_rel_l2_u']:.3e}"
    )

# Deployment pick-best WITHOUT the exact solution: training-data misfit +
# fresh-batch residual per member (selection_scores; measured selector
# quality vs the oracle in PARITY 4p). The CLI twin is
# `train --ensemble E --select`.
from pinns_tpu.parallel.ensemble import select_member, selection_scores

scores = selection_scores(trainer, stacked, len(seeds))
pick = select_member(scores)
print(
    f"selected member (no ground truth): {pick} "
    f"(score {scores[pick]['score']:.3e}); its oracle rel-L2: "
    f"{summaries[pick]['rel_l2_u']:.3e}"
)

ds = trainer.problem.dataset
out = ensemble_predict(trainer, stacked, ds.X_star)
mean_err = relative_l2(out["u"]["mean"], ds.star["u"])
print(f"ensemble-mean rel-L2: {mean_err:.3e}")

# UQ signal: does the predictive std rank the actual pointwise error?
err = np.abs(out["u"]["mean"] - np.asarray(ds.star["u"]))
corr = np.corrcoef(out["u"]["std"].ravel(), err.ravel())[0, 1]
print(f"std-vs-|error| correlation: {corr:.3f}")

# Honest bands: raw deep-ensemble sigma is measured ~8x overconfident at
# fronts (PARITY 4n); split-conformal calibration on a held-out subset
# (k_conf95) restores guaranteed ~95% marginal coverage, verified on the
# disjoint remainder (cov_conf95).
from pinns_tpu.parallel.ensemble import uq_calibration

cal_all = uq_calibration(trainer, stacked)
cal = cal_all["u"]
print(
    f"raw cov@2sigma: {cal['cov2s']:.2f}  ->  conformal k={cal['k_conf95']:.1f}"
    f" gives holdout coverage {cal['cov_conf95']:.2f}"
    f" (shock-conditional {cal.get('cov_conf95_shock', float('nan')):.2f})"
)
# Mondrian std-binned factors fix the shock-conditional flank: each point
# is binned by its own predicted std, each bin carries its own quantile
print(
    f"mondrian k per std bin: {[round(k, 1) for k in cal['mond_k']]}"
    f" -> coverage {cal['cov_mond95']:.2f}"
    f" (shock-conditional {cal.get('cov_mond95_shock', float('nan')):.2f})"
)

if "--plot" in sys.argv:
    from pinns_tpu.viz.plots import plot_uncertainty

    print(plot_uncertainty(ds, out, out_path="ensemble_uq.png",
                           calibration=cal_all))
