"""Canonical viscous Burgers forward problem, end to end.

Reproduces the reference's headline experiment (rel-L2 ~1e-3 vs the exact
Cole-Hopf solution) with the full hybrid schedule. On a TPU chip this takes a
few minutes; pass --quick for a CPU-friendly smoke run.

    python examples/01_burgers_forward.py [--quick]
"""

import sys

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

quick = "--quick" in sys.argv
exp = get_preset("burgers_forward")
if quick:
    exp = override(exp, {
        "train.epochs": 2000,
        "train.chunk": 500,
        "optimizer.kind": "adam",
        "sampling.n_f": 2000,
        "sampling.strategy": "fixed_lhs",
    })

trainer = Trainer(exp)
state, summary = trainer.train()
print(f"relative L2 error: {summary['rel_l2_u']:.3e}")

# full-grid prediction for plotting / downstream use
preds = trainer.predict(state.params, trainer.problem.dataset.X_star)
print("prediction grid:", preds["u"].shape, "residual field:", preds["f"].shape)
