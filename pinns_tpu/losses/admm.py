"""ADMM splitting of the L1 residual penalty, as functional state updates.

Reference semantics (``Abgrall_ADMM.py:119-134, 185-198, 210-226`` for the
single-residual Burgers case; ``Euler_ADMM.py:114-141, 203-215, 237-242`` for
the 3-residual Euler case):

- auxiliary variable z and scaled dual (called gamma / lagrange) are
  non-trainable per-collocation-point vectors, initialized z = r(w_0) at the
  initial collocation set and dual = 1;
- weight-update loss term: (rho/2) ||r(w) - z + dual/rho||_2^2
  (the Hwan ADMM variant additionally carries the explicit inner product
  dual^T r(w), ``Hwan_L1Regularization_ADMM_Burgers.py:98-100`` — supported
  via `explicit_inner=True`);
- z-update: soft-threshold prox of (1/N_f)||.||_1, threshold 1/(rho N_f)
  applied to r(w) + dual/rho;
- dual-update: dual += rho (r(w) - z).

Here the (z, dual) pair is a pytree carried through the jitted train step —
no variable assignment, no session round-trips. For the multi-residual Euler
system, z/dual are tuples and every update maps across them. Under
data-parallel sharding, z/dual are sharded exactly like the collocation batch
they index (SURVEY.md §7 hard part #4).

Resampling semantics note: the reference resamples collocation points AFTER
the weight update and then evaluates the z/dual updates at the NEW points
(``Abgrall_ADMM.py:220-226``), i.e. z compared against residuals at points it
was not computed from. `admm_update` takes the residual wherever the caller
evaluated it, so both the reference semantics and the "same-points" variant
are expressible; trainers default to reference semantics.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple, Union

import jax
import jax.numpy as jnp

from pinns_tpu.ops.prox import soft_threshold

Residuals = Union[jnp.ndarray, Tuple[jnp.ndarray, ...]]


class ADMMState(NamedTuple):
    """Auxiliary and scaled-dual variables; tuples for multi-residual PDEs."""

    z: Residuals
    dual: Residuals


def _map(fn, *trees):
    """Map fn over matching (tuples of) arrays."""
    if isinstance(trees[0], tuple):
        return tuple(fn(*xs) for xs in zip(*trees))
    return fn(*trees)


def admm_init(residuals: Residuals) -> ADMMState:
    """z = r(w_0), dual = ones (``Abgrall_ADMM.py:96-97,121-122``)."""
    z = _map(lambda f: f, residuals)
    dual = _map(jnp.ones_like, residuals)
    return ADMMState(z=z, dual=dual)


def admm_penalty(
    residuals: Residuals,
    state: ADMMState,
    rho: float,
    explicit_inner: bool = False,
):
    """Augmented-Lagrangian penalty summed over residual components.

    (rho/2)||r - z + dual/rho||^2, plus dual^T r when `explicit_inner`
    (the Hwan variant's form, ``Hwan_L1Regularization_ADMM_Burgers.py:98-100``).
    """

    def term(f, z, dual):
        q = f - z + dual / rho
        val = 0.5 * rho * jnp.sum(q * q)
        if explicit_inner:
            val = val + jnp.sum(dual * f)
        return val

    parts = _map(term, residuals, state.z, state.dual)
    if isinstance(parts, tuple):
        return sum(parts)
    return parts


def admm_update(residuals: Residuals, state: ADMMState, rho: float, n_f: int) -> ADMMState:
    """One (z, dual) update at the given residual values.

    Order matches the reference: z first from the OLD dual, then dual from the
    NEW z (``Abgrall_ADMM.py:225-226``; ``Euler_ADMM.py:237-242``).
    Threshold c = 1/(rho * N_f) (``Abgrall_ADMM.py:124``).
    """
    c = 1.0 / (rho * n_f)
    z_new = _map(lambda f, d: soft_threshold(f + d / rho, c), residuals, state.dual)
    dual_new = _map(
        lambda d, f, z: d + rho * (f - z), state.dual, residuals, z_new
    )
    return ADMMState(z=z_new, dual=dual_new)


def admm_misfit(residuals: Residuals, state: ADMMState):
    """Consistency monitor mean|r(w) - z| (``Abgrall_ADMM.py:60``)."""
    parts = _map(lambda f, z: jnp.mean(jnp.abs(f - z)), residuals, state.z)
    if isinstance(parts, tuple):
        return sum(parts) / len(parts)
    return parts
