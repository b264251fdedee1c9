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

import jax
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


def causal_residual_penalty(
    residuals, t, t_lb, t_ub, eps: float, bins: int, relative: bool = False
):
    """Causal-in-time mean-square residual (beyond-reference; Wang, Sankaran
    & Perdikaris 2022, "Respecting causality"): the residual at later times
    only counts once earlier times are fit.

    The time domain is split into `bins` uniform bins; with L_b the mean
    squared residual in bin b (summed over fields for systems), the term is

        (1/B) sum_b w_b L_b,   w_b = stop_grad(exp(-eps * sum_{b'<b} L_b')).

    Exact forward-causal weights per batch — no persistent state, so it
    composes with per-step resampling (segment reductions are a fixed-shape
    scatter-add, jit/vmap/shard friendly). At eps=0 every w_b = 1 and the
    term reduces to the plain bin-averaged mean-square.

    Args:
      residuals: (N, 1) array or tuple of them (system: fields are summed
        pointwise before binning, and the weights are shared — the causal
        structure is the PDE's, not per-equation).
      t: (N,) or (N, 1) time coordinate of each collocation point.
      t_lb / t_ub: time-domain bounds (bins span [t_lb, t_ub]).
      eps: causality strength (0 disables the weighting but keeps binning).
      bins: number of time bins (static).
      relative: normalize the prefix by the batch-mean bin loss
        (stop-gradient) before exponentiating — w_b =
        exp(-eps * prefix_b / mean(L)). The weights become scale-free: when
        residuals shrink uniformly the selection pressure PERSISTS instead
        of fading to w=1, which is the measured over-training drift of the
        absolute form (PARITY §4j: 0.0745 @ 200k -> 0.118 @ 500k as
        residuals vanish). With uniform bin losses prefix/mean ≈ the bin
        index, so eps plays at O(1/bins) scale (e.g. 0.1-0.3 at 32 bins),
        NOT at the absolute form's tuned eps=30.

    Returns (term, weights) — the scalar loss term and the (bins,) weight
    vector (diagnostic; min(w) -> 1 signals the solve is converged in
    causal terms).
    """
    if not isinstance(residuals, tuple):
        residuals = (residuals,)
    sq = sum(jnp.sum(f * f, axis=tuple(range(1, f.ndim))) for f in residuals)
    tt = t.reshape(-1)
    frac = (tt - t_lb) / (t_ub - t_lb)
    idx = jnp.clip((frac * bins).astype(jnp.int32), 0, bins - 1)
    sums = jax.ops.segment_sum(sq, idx, num_segments=bins)
    counts = jax.ops.segment_sum(jnp.ones_like(sq), idx, num_segments=bins)
    l_b = sums / jnp.maximum(counts, 1.0)
    prefix = jnp.cumsum(l_b) - l_b  # exclusive: earlier bins only
    if relative:
        prefix = prefix / (jnp.mean(l_b) + 1e-30)
    w = jax.lax.stop_gradient(jnp.exp(-eps * prefix))
    return jnp.mean(w * l_b), w
