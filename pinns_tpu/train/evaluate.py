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


def predict_field_dx(problem, params, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """x-derivative of each network field at points x (N, 2) — ONE Taylor-1
    pass. This is the serving-time front proxy for Mondrian conformal
    binning (LossConfig has no role here; see
    parallel.ensemble.uq_calibration(mond_feature='dx')): fronts are where
    |d(field)/dx| is large, and the model's own predicted derivative
    resolves them even when the ensemble std does not (PARITY §4n's rho
    flank). Returns {'u': (N, 1)} for Burgers, {'rho','u','E'} for Euler.
    """
    from pinns_tpu.ops.taylor import mlp_taylor_1

    _, y_x, _ = mlp_taylor_1(problem.spec, params["net"], x)
    if problem.exp.pde.kind == "burgers":
        return {"u": y_x[:, 0:1]}
    return {"rho": y_x[:, 0:1], "u": y_x[:, 1:2], "E": y_x[:, 2:3]}
