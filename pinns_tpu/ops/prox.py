"""Proximal operators.

The reference implements the L1 soft-threshold with a two-``tf.where`` mask
trick (``compute_z``, ``Abgrall_ADMM.py:185-198``; ``Euler_ADMM.py:203-215``).
Here it is the standard branchless closed form, trivially fused by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp


def soft_threshold(v: jnp.ndarray, threshold) -> jnp.ndarray:
    """prox of threshold * ||.||_1: sign(v) * max(|v| - threshold, 0)."""
    return jnp.sign(v) * jnp.maximum(jnp.abs(v) - threshold, 0.0)
