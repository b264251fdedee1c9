"""PDE residual operators built on the Taylor-mode MLP derivative core.

Burgers (``Abgrall_ADMM.py:170-180``):
    f = u_t + lambda1 * u * u_x - lambda2 * u_xx

Euler 1D conservative system (``Euler_ADMM.py:176-198``), gamma-law closure
p = (gamma - 1)(E - rho u^2 / 2):
    f1 = rho_t + (rho u)_x
    f2 = (rho u)_t + (rho u^2)_x + p_x
    f3 = E_t + (u E)_x + (u p)_x

The reference assembles the Euler fluxes with 8 separate reverse-mode
``tf.gradients`` sweeps over *products* of network outputs. Here the products
are expanded by the chain rule over the primitive derivatives
(rho_x, u_x, E_x, rho_t, u_t, E_t), which one ``mlp_taylor_1`` pass provides —
the whole residual is a single fused XLA computation. The reference's
``(rho u)_t`` uses rho_t u + rho u_t etc., which is what reverse-mode AD of
the product computes, so the expansions are mathematically identical.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from pinns_tpu.models.mlp import MLPSpec, Params
from pinns_tpu.ops.taylor import mlp_taylor_1, mlp_taylor_2


def burgers_residual(
    spec: MLPSpec,
    params: Params,
    x: jnp.ndarray,
    lambda1,
    lambda2,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Burgers PDE residual at collocation points.

    Args:
      x: (N, 2) points, columns (x, t).
      lambda1, lambda2: PDE coefficients (convection, viscosity). Scalars or
        (1,) arrays; trainable in identification mode (the reference keeps
        them as frozen tf.Variables, ``Abgrall_ADMM.py:105-106``).

    Returns:
      (u, f): network value and PDE residual, each (N, 1).
    """
    u, f, _, _ = burgers_residual_aux(spec, params, x, lambda1, lambda2)
    return u, f


def burgers_residual_aux(
    spec: MLPSpec,
    params: Params,
    x: jnp.ndarray,
    lambda1,
    lambda2,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Burgers residual plus the first derivatives it is built from.

    Returns (u, f, u_x, u_t) — the extras feed shock-capture terms
    (gradient weighting, entropy-admissibility; LossConfig) without a second
    Taylor pass.
    """
    u, u_x, u_t, u_xx = mlp_taylor_2(spec, params, x)
    f = u_t + lambda1 * u * u_x - lambda2 * u_xx
    return u, f, u_x, u_t


def euler_residuals(
    spec: MLPSpec,
    params: Params,
    x: jnp.ndarray,
    gamma: float = 1.4,
) -> Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
    """1D compressible Euler residuals (mass, momentum, energy).

    The network has 3 outputs (rho, u, E) from one trunk
    (``Euler_ADMM.py:172-174``); gamma defaults to 1.4
    (``Euler_ADMM.py:181``).

    Returns:
      ((rho, u, E), (f1, f2, f3)), each entry (N, 1).
    """
    fields, residuals, _ = euler_residuals_aux(spec, params, x, gamma)
    return fields, residuals


def euler_residuals_aux(
    spec: MLPSpec,
    params: Params,
    x: jnp.ndarray,
    gamma: float = 1.4,
):
    """Euler residuals plus the full first-derivative arrays (y_x, y_t) they
    are built from — consumed by the shock-capture terms (gradient
    weighting, physical-entropy admissibility; LossConfig).

    Returns ((rho, u, E), (f1, f2, f3), (y_x, y_t)) with y_* of shape
    (N, 3) in field order (rho, u, E)."""
    y, y_x, y_t = mlp_taylor_1(spec, params, x)
    rho, u, e = y[:, 0:1], y[:, 1:2], y[:, 2:3]
    rho_x, u_x, e_x = y_x[:, 0:1], y_x[:, 1:2], y_x[:, 2:3]
    rho_t, u_t, e_t = y_t[:, 0:1], y_t[:, 1:2], y_t[:, 2:3]

    p = (gamma - 1.0) * (e - 0.5 * rho * u * u)
    p_x = (gamma - 1.0) * (e_x - 0.5 * (rho_x * u * u + 2.0 * rho * u * u_x))

    f1 = rho_t + (rho_x * u + rho * u_x)
    f2 = (rho_t * u + rho * u_t) + (rho_x * u * u + 2.0 * rho * u * u_x) + p_x
    f3 = e_t + (u_x * e + u * e_x) + (u_x * p + u * p_x)
    return (rho, u, e), (f1, f2, f3), (y_x, y_t)


def euler_entropy_production(y, y_x, y_t, gamma: float = 1.4, eps: float = 1e-3):
    """Physical-entropy rate along particle paths, D = S_t + u S_x for
    S = log p - gamma log rho (specific entropy up to constants).

    The entropy inequality for admissible weak solutions is D >= 0 (entropy
    is produced, never destroyed, across shocks); relu(-D)^2 is the
    admissibility penalty. Derivatives expand by the chain rule over the
    taylor-1 outputs; p and rho are clamped at eps so the penalty is only
    active (and differentiable) where the state is physical."""
    rho, u, e = y[:, 0:1], y[:, 1:2], y[:, 2:3]
    rho_x, u_x, e_x = y_x[:, 0:1], y_x[:, 1:2], y_x[:, 2:3]
    rho_t, u_t, e_t = y_t[:, 0:1], y_t[:, 1:2], y_t[:, 2:3]
    g = gamma
    p = (g - 1.0) * (e - 0.5 * rho * u * u)
    p_x = (g - 1.0) * (e_x - 0.5 * (rho_x * u * u + 2.0 * rho * u * u_x))
    p_t = (g - 1.0) * (e_t - 0.5 * (rho_t * u * u + 2.0 * rho * u * u_t))
    p_c = jnp.maximum(p, eps)
    rho_c = jnp.maximum(rho, eps)
    s_x = p_x / p_c - g * rho_x / rho_c
    s_t = p_t / p_c - g * rho_t / rho_c
    return s_t + u * s_x


def euler_pressure(rho, u, e, gamma: float = 1.4):
    """gamma-law pressure closure p = (gamma-1)(E - rho u^2 / 2)."""
    return (gamma - 1.0) * (e - 0.5 * rho * u * u)
