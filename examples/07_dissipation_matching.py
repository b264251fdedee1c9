"""Dissipation matching: identify a dataset's effective viscosity, then
train the forward recipe against the PDE the data actually satisfies.

Shock datasets produced by numerical solvers are never exactly inviscid —
the scheme's own dissipation is baked into the stored grid. Training a
PINN with the nominal inviscid residual therefore optimizes toward a PDE
the data does NOT satisfy, and the misfit floor is set by that mismatch,
not by the network. This is the lever that broke all three shock-dataset
plateaus in this framework (PARITY.md §4k/§4l/§4q; e.g. the Abgrall grid:
rel-L2 0.235 inviscid -> 0.012 matched, a 20x drop for one config value).

The workflow, on the Abgrall Burgers dataset (`Abgrall_burgers_shock.mat`,
regenerated natively when the reference tree is absent):

1. IDENTIFY: an inverse PINN with trainable (lambda1, nu) on interior
   observations recovers the data's effective PDE
   u_t + lambda1 u u_x = nu u_xx  (expected: lambda1 ~ 1.0, nu ~ 4.8e-3 —
   the stored DG producer's numerical dissipation).
2. MATCH: the forward recipe freezes the identified nu and trains the
   standard config — same data, same loss, one changed coefficient.
3. CONTROL: the same forward budget with the nominal inviscid residual
   (nu = 0), to show the plateau the matching removes.

    python examples/07_dissipation_matching.py [--quick]

--quick shrinks budgets for a CPU smoke run (~2 min); full budgets
reproduce the measured numbers on a TPU chip (~4 min total, cached).
"""

import sys

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

quick = "--quick" in sys.argv

# -- 1. identify the effective PDE from interior data ------------------------
ident = override(get_preset("burgers_inverse"), {
    "data.dataset": "abgrall_burgers_shock",
    "train.log_every": 0,
})
if quick:
    ident = override(ident, {
        "model.layers": (2, 32, 32, 32, 1),
        "train.epochs": 4000, "train.chunk": 1000,
        "optimizer.kind": "adam", "sampling.n_f": 1000, "data.n_u": 1000,
    })
_, s = Trainer(ident).train()
lam1, nu_hat = s["lambda1"], s["lambda2"]
print(f"identified: lambda1 = {lam1:.4f}, nu = {nu_hat:.2e} "
      f"(oracle: 1.008, 4.95e-3 — PARITY §2)")

# -- 2. forward recipe with the identified dissipation ------------------------
budget = {"train.log_every": 0}
if quick:
    # narrow net + 25k epochs: enough for the inviscid run to hit its
    # mismatch plateau (~0.10) while the matched run goes to ~0.02 (the
    # full wide-net budgets measure 0.235 vs 0.012 — PARITY §4q)
    budget.update({
        "model.layers": (2, 32, 32, 32, 1),
        "train.epochs": 25_000, "train.chunk": 5000,
    })
matched = override(get_preset("abgrall_visc"),
                   {**budget, "pde.lambda2": float(nu_hat)})
_, s_matched = Trainer(matched).train()

# -- 3. inviscid control at the same budget -----------------------------------
control = override(get_preset("abgrall_visc"), {**budget, "pde.lambda2": 0.0})
_, s_control = Trainer(control).train()

u_m, u_c = s_matched["rel_l2_u"], s_control["rel_l2_u"]
print(f"forward rel-L2(u): matched nu {u_m:.4f} vs inviscid {u_c:.4f} "
      f"({u_c / max(u_m, 1e-12):.1f}x)")
assert u_m < 0.6 * u_c, \
    "matching the identified dissipation must clearly beat inviscid"
