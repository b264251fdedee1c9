import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinns_tpu.models.mlp import (
    MLPSpec,
    init_mlp,
    mlp_apply,
    normalize_inputs,
    stack_params,
    unstack_params,
)

SPEC = MLPSpec(layers=(2, 20, 20, 1), lb=(-1.0, 0.0), ub=(1.0, 1.0))


def test_init_shapes_and_stats():
    params = init_mlp(jax.random.key(0), SPEC)
    assert len(params) == 3
    assert params[0]["W"].shape == (2, 20)
    assert params[0]["b"].shape == (1, 20)
    assert params[-1]["W"].shape == (20, 1)
    # truncated normal: bounded by 2 sigma, zero-mean-ish
    big = MLPSpec(layers=(200, 200, 1), lb=(0.0,) * 200, ub=(1.0,) * 200)
    p = init_mlp(jax.random.key(1), big)
    w = np.asarray(p[0]["W"])
    std = np.sqrt(2.0 / (200 + 200))
    assert np.abs(w).max() <= 2.0 * std + 1e-6
    assert abs(w.mean()) < 3e-3
    assert np.all(np.asarray(p[0]["b"]) == 0.0)


def test_normalization_maps_bounds_to_pm1():
    x = jnp.array([[-1.0, 0.0], [1.0, 1.0], [0.0, 0.5]])
    h = normalize_inputs(SPEC, x)
    np.testing.assert_allclose(h[0], [-1.0, -1.0], atol=1e-7)
    np.testing.assert_allclose(h[1], [1.0, 1.0], atol=1e-7)
    np.testing.assert_allclose(h[2], [0.0, 0.0], atol=1e-7)


def test_forward_matches_numpy():
    params = init_mlp(jax.random.key(2), SPEC)
    x = jax.random.uniform(jax.random.key(3), (7, 2), minval=-1.0, maxval=1.0)
    y = mlp_apply(SPEC, params, x)
    assert y.shape == (7, 1)

    # independent numpy recomputation
    lb, ub = np.array(SPEC.lb), np.array(SPEC.ub)
    h = 2.0 * (np.asarray(x) - lb) / (ub - lb) - 1.0
    for layer in params[:-1]:
        h = np.tanh(h @ np.asarray(layer["W"]) + np.asarray(layer["b"]))
    y_np = h @ np.asarray(params[-1]["W"]) + np.asarray(params[-1]["b"])
    np.testing.assert_allclose(np.asarray(y), y_np, rtol=1e-4, atol=1e-5)


def test_spec_validation():
    with pytest.raises(ValueError):
        MLPSpec(layers=(2, 4, 1), lb=(0.0,), ub=(1.0, 1.0))


def test_stack_unstack_roundtrip():
    ps = [init_mlp(jax.random.key(i), SPEC) for i in range(3)]
    stacked = stack_params(ps)
    assert stacked[0]["W"].shape == (3, 2, 20)
    back = unstack_params(stacked, 3)
    for a, b in zip(ps, back):
        for la, lb_ in zip(a, b):
            np.testing.assert_array_equal(la["W"], lb_["W"])


def test_vmapped_ensemble_forward():
    ps = stack_params([init_mlp(jax.random.key(i), SPEC) for i in range(4)])
    x = jnp.ones((5, 2)) * 0.3
    y = jax.vmap(lambda p: mlp_apply(SPEC, p, x))(ps)
    assert y.shape == (4, 5, 1)
    # members differ
    assert not np.allclose(np.asarray(y[0]), np.asarray(y[1]))
