"""Collocation-point samplers: Latin hypercube and uniform, host and on-device.

The reference uses pyDOE's ``lhs`` on host for fixed collocation sets
(``Hwan_L2Regularization_Burgers.py:183``) and per-epoch host numpy uniform
resampling fed through placeholders (``Abgrall_ADMM.py:220-223``). Here both
are native:

- :func:`latin_hypercube` is a jittable jax.random LHS (stratified segments,
  independently permuted per dimension — the same scheme as pyDOE's default
  'random' criterion);
- :func:`uniform_box` is the on-device uniform sampler used INSIDE the train
  step, so resampling costs no host round-trip. Under a sharded step the PRNG
  generates the global array directly in its sharded layout
  (threefry_partitionable), so per-shard streams need no host coordination.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scale_to_bounds(unit: jnp.ndarray, lb, ub) -> jnp.ndarray:
    """Map unit-cube samples to the box [lb, ub]."""
    lb = jnp.asarray(lb, dtype=unit.dtype)
    ub = jnp.asarray(ub, dtype=unit.dtype)
    return lb + (ub - lb) * unit


def latin_hypercube(key: jax.Array, n: int, dim: int, dtype=jnp.float32):
    """Latin hypercube sample on the unit cube: (n, dim).

    Each dimension is an independent random permutation of the n strata, with
    a uniform draw inside each stratum.
    """
    k_u, *k_perm = jax.random.split(key, dim + 1)
    u = jax.random.uniform(k_u, (n, dim), dtype=dtype)
    strata = jnp.arange(n, dtype=dtype)[:, None]
    cols = [
        jax.random.permutation(k, strata[:, 0])[:, None] for k in k_perm
    ]
    perm = jnp.concatenate(cols, axis=1)
    return (perm + u) / n


def uniform_box(key: jax.Array, n: int, lb, ub, dtype=jnp.float32):
    """Uniform sample of n points in the box [lb, ub]: (n, len(lb))."""
    lb = jnp.asarray(lb, dtype=dtype)
    ub = jnp.asarray(ub, dtype=dtype)
    u = jax.random.uniform(key, (n, lb.shape[0]), dtype=dtype)
    return lb + (ub - lb) * u


def lhs_with_anchors(
    key: jax.Array, n: int, lb, ub, anchors: jnp.ndarray, dtype=jnp.float32
):
    """LHS collocation set stacked with anchor (data) points.

    Mirrors ``X_f_train = vstack((lhs_sample, X_u_train))``
    (``Hwan_L2Regularization_Burgers.py:183-184``): the fixed collocation set
    includes the supervised points.
    """
    lhs_pts = scale_to_bounds(latin_hypercube(key, n, len(lb), dtype), lb, ub)
    return jnp.concatenate([lhs_pts, jnp.asarray(anchors, dtype)], axis=0)
