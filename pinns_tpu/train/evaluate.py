"""Prediction and the metric of record: relative L2 error vs the exact grid.

Reference parity: ``predict`` + final ``error_u = ||u* - u_hat||_2 / ||u*||_2``
(``Abgrall_ADMM.py:254-262, 318-319``; per-field for Euler,
``Euler_ADMM.py:260-272, 342-347``). The reference's predict costs 2 (Burgers)
or 6 (Euler) separate ``sess.run`` round-trips; here it is one jitted call
returning every field and residual at once.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np


def relative_l2(pred: np.ndarray, exact: np.ndarray) -> float:
    """||exact - pred||_2 / ||exact||_2 over flattened arrays."""
    pred = np.asarray(pred).ravel()
    exact = np.asarray(exact).ravel()
    return float(np.linalg.norm(exact - pred) / np.linalg.norm(exact))


def predict_fields(problem, params, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Evaluate network fields and PDE residuals at points x (N, 2).

    Returns {'u': ..., 'f': ...} for Burgers and
    {'rho','u','E','f1','f2','f3'} for Euler.
    """
    from pinns_tpu.ops.residuals import burgers_residual, euler_residuals

    exp = problem.exp
    net = params["net"]
    lam1, lam2 = problem.effective_coeffs(params)
    if exp.pde.kind == "burgers":
        u, f = burgers_residual(problem.spec, net, x, lam1, lam2)
        return {"u": u, "f": f}
    fields, residuals = euler_residuals(problem.spec, net, x, exp.pde.gamma)
    rho, u, e = fields
    f1, f2, f3 = residuals
    return {"rho": rho, "u": u, "E": e, "f1": f1, "f2": f2, "f3": f3}
