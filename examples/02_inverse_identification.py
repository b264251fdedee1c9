"""Inverse problem: identify the Burgers PDE coefficients from (noisy) data.

Learns lambda1 (convection) and nu = exp(raw lambda2) (viscosity) jointly
with the network from interior observations of u(t, x) — the identification
capability the reference scaffolds but keeps frozen
(Abgrall_ADMM.py:105-106). Targets: lambda1 within 1% of 1.0, nu within 1%
of 0.01/pi.

    python examples/02_inverse_identification.py [--noise 0.01] [--quick]
"""

import math
import sys

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

noise = 0.0
if "--noise" in sys.argv:
    noise = float(sys.argv[sys.argv.index("--noise") + 1])

exp = override(get_preset("burgers_inverse"), {"data.noise": noise})
if "--quick" in sys.argv:
    exp = override(exp, {
        "train.epochs": 3000,
        "train.chunk": 500,
        "optimizer.kind": "adam",
        "sampling.n_f": 2000,
    })

trainer = Trainer(exp)
state, summary = trainer.train()
nu_true = 0.01 / math.pi
print(f"lambda1 = {summary['lambda1']:.5f}  (error {abs(summary['lambda1'] - 1) * 100:.3f}%)")
print(f"nu      = {summary['lambda2']:.6f} (error {abs(summary['lambda2'] - nu_true) / nu_true * 100:.3f}%)")
