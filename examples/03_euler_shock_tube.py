"""1D compressible Euler system with ADMM-regularized residuals.

The reference's Euler_ADMM.py experiment: one 5x200 trunk with 3 outputs
(rho, u, E), three conservative residuals with per-residual ADMM states,
trained from IC/BC data of the Sod/Lax-blend shock tube. The ground-truth
grid regenerates natively (FV solver) if the reference .mat is absent.

    python examples/03_euler_shock_tube.py [--quick]

This drives the reference-parity configuration. For the best-known
quality, use the `euler_weak` preset instead (weak-form flux + matched
dissipation + strong-mass mix — rho 2.1% / u 5.4% / E 1.6% at 1M
epochs, PARITY.md §4l), and `euler_inverse` to identify the dataset's
dissipation from interior data.
"""

import sys

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

exp = get_preset("euler_admm")
if "--quick" in sys.argv:
    exp = override(exp, {
        "model.layers": (2, 32, 32, 3),
        "train.epochs": 2000,
        "train.chunk": 250,
        "sampling.n_f": 512,
    })

trainer = Trainer(exp)
state, summary = trainer.train()
for field in ("rho", "u", "E"):
    print(f"rel-L2 {field}: {summary[f'rel_l2_{field}']:.3e}")
