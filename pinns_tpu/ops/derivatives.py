"""Nested forward-mode (jvp) derivative operators.

These are the generic JAX formulations of the same derivatives that
``pinns_tpu.ops.taylor`` computes in closed form for tanh MLPs. They work for
ANY apply function (so custom architectures get PDE residuals for free) and
serve as the cross-validation oracle for the Taylor-mode fast path in tests.

The reference computes these with chained reverse-mode ``tf.gradients``
(``Abgrall_ADMM.py:175-177``); forward-over-forward is the right shape for
PINNs (few input dims, many outputs/batch), avoiding reverse-sweep graph
blowup under the outer training grad.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def _unit_tangent(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Tangent array dX with ones in input column `dim`, zeros elsewhere."""
    e = jnp.zeros((1, x.shape[-1]), dtype=x.dtype).at[0, dim].set(1.0)
    return jnp.broadcast_to(e, x.shape)


def derivs_1_jvp(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray], x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(y, dy/dx0, dy/dx1) via two jvp sweeps. x: (N, 2)."""
    ex = _unit_tangent(x, 0)
    et = _unit_tangent(x, 1)
    y, y_x = jax.jvp(apply_fn, (x,), (ex,))
    _, y_t = jax.jvp(apply_fn, (x,), (et,))
    return y, y_x, y_t


def derivs_2_jvp(
    apply_fn: Callable[[jnp.ndarray], jnp.ndarray], x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(y, dy/dx0, dy/dx1, d2y/dx0^2) via jvp-of-jvp. x: (N, 2)."""
    ex = _unit_tangent(x, 0)
    et = _unit_tangent(x, 1)

    def dfdx(z):
        return jax.jvp(apply_fn, (z,), (jnp.broadcast_to(ex[:1], z.shape),))[1]

    y, y_t = jax.jvp(apply_fn, (x,), (et,))
    y_x, y_xx = jax.jvp(dfdx, (x,), (ex,))
    return y, y_x, y_t, y_xx
