"""Data-misfit and residual-penalty terms, with the reference's exact
normalizations.

The seven reference scripts differ subtly in their loss terms (SURVEY.md §2.1,
hard part #5). The variants, each cited:

data misfit kinds
  'mse_sum'  : (1/N_u) ||u - u_hat||_2^2          Abgrall_ADMM.py:129, Abgrall_L1.py:59,
                                                   Abgrall_L2.py:59, Burgers_batch_L2.py:57,
                                                   Euler_ADMM.py:128-130 (per field),
                                                   Hwan_L1Regularization_ADMM_Burgers.py:98
  'l2_norm'  : ||u - u_hat||_2 (UNSQUARED)         Hwan_L2Regularization_Burgers.py:68

residual penalty kinds
  'mean_sq'      : mean(f^2)                       Hwan_L2Regularization_Burgers.py:69
  'l2_sq_norm'   : (1/N_f) ||f||_2^2               Abgrall_L2.py:60
  'l1_sq_norm'   : (1/N_f) ||f||_1^2               Abgrall_L1.py:60, Burgers_batch_L2.py:58
  (ADMM augmented-Lagrangian penalties live in pinns_tpu.losses.admm)

All are plain reductions over the batch axis, so under data-parallel sharding
they decompose into per-shard partial sums + one psum (the ||.||_p^p forms are
linear in per-point contributions; the unsquared 'l2_norm' takes the sqrt
after the psum).
"""

from __future__ import annotations

import jax.numpy as jnp

DATA_MISFIT_KINDS = ("mse_sum", "l2_norm")
RESIDUAL_PENALTY_KINDS = ("mean_sq", "l2_sq_norm", "l1_sq_norm")


def data_misfit(pred: jnp.ndarray, target: jnp.ndarray, kind: str, n: int):
    """Data-fit term. `n` is the reference's N_u normalizer (static)."""
    r = pred - target
    if kind == "mse_sum":
        return jnp.sum(r * r) / n
    if kind == "l2_norm":
        return jnp.sqrt(jnp.sum(r * r))
    raise ValueError(f"unknown data misfit kind: {kind!r}")


def residual_penalty(f: jnp.ndarray, kind: str, n: int):
    """Residual regularization term. `n` is the reference's N_f normalizer."""
    if kind == "mean_sq":
        return jnp.mean(f * f)
    if kind == "l2_sq_norm":
        return jnp.sum(f * f) / n
    if kind == "l1_sq_norm":
        s = jnp.sum(jnp.abs(f))
        return s * s / n
    raise ValueError(f"unknown residual penalty kind: {kind!r}")
