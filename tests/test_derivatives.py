"""Cross-validate the Taylor-mode closed forms against nested jvp and FD."""

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

from pinns_tpu.models.mlp import MLPSpec, init_mlp, mlp_apply
from pinns_tpu.ops.derivatives import derivs_1_jvp, derivs_2_jvp
from pinns_tpu.ops.taylor import mlp_taylor_1, mlp_taylor_2

SPEC1 = MLPSpec(layers=(2, 16, 16, 16, 3), lb=(0.0, 0.0), ub=(1.0, 0.2))
SPEC2 = MLPSpec(layers=(2, 20, 20, 20, 1), lb=(-1.0, 0.0), ub=(1.0, 1.0))


def _points(key, spec, n=64):
    lb = jnp.asarray(spec.lb)
    ub = jnp.asarray(spec.ub)
    return lb + (ub - lb) * jax.random.uniform(key, (n, 2))


def test_taylor1_matches_jvp():
    params = init_mlp(jax.random.key(0), SPEC1)
    x = _points(jax.random.key(1), SPEC1)
    y, yx, yt = mlp_taylor_1(SPEC1, params, x)
    y2, yx2, yt2 = derivs_1_jvp(lambda z: mlp_apply(SPEC1, params, z), x)
    np.testing.assert_allclose(y, y2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(yx, yx2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(yt, yt2, rtol=1e-4, atol=1e-5)


def test_taylor2_matches_jvp_of_jvp():
    params = init_mlp(jax.random.key(2), SPEC2)
    x = _points(jax.random.key(3), SPEC2)
    y, yx, yt, yxx = mlp_taylor_2(SPEC2, params, x)
    y2, yx2, yt2, yxx2 = derivs_2_jvp(lambda z: mlp_apply(SPEC2, params, z), x)
    np.testing.assert_allclose(y, y2, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(yx, yx2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(yt, yt2, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(yxx, yxx2, rtol=1e-3, atol=1e-4)


def test_taylor2_matches_finite_differences():
    """FD oracle in float64 (numpy forward) against the f32 Taylor pass."""
    params = init_mlp(jax.random.key(4), SPEC2)
    x = np.asarray(_points(jax.random.key(5), SPEC2, n=32), dtype=np.float64)
    _, yx, yt, yxx = mlp_taylor_2(SPEC2, params, jnp.asarray(x, jnp.float32))

    lb, ub = np.array(SPEC2.lb), np.array(SPEC2.ub)
    ws = [np.asarray(l["W"], np.float64) for l in params]
    bs = [np.asarray(l["b"], np.float64) for l in params]

    def u(z):
        h = 2.0 * (z - lb) / (ub - lb) - 1.0
        for w, b in zip(ws[:-1], bs[:-1]):
            h = np.tanh(h @ w + b)
        return h @ ws[-1] + bs[-1]

    h = 1e-4
    ex = np.array([[h, 0.0]])
    et = np.array([[0.0, h]])
    fd_x = (u(x + ex) - u(x - ex)) / (2 * h)
    fd_t = (u(x + et) - u(x - et)) / (2 * h)
    fd_xx = (u(x + ex) - 2 * u(x) + u(x - ex)) / (h * h)
    np.testing.assert_allclose(np.asarray(yx, np.float64), fd_x, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(yt, np.float64), fd_t, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(yxx, np.float64), fd_xx, rtol=5e-3, atol=5e-3)


def test_taylor_is_trainable():
    """Reverse-mode grad flows through the Taylor propagation (3rd-order AD)."""
    params = init_mlp(jax.random.key(6), SPEC2)
    x = _points(jax.random.key(7), SPEC2, n=16)

    def loss(p):
        _, yx, yt, yxx = mlp_taylor_2(SPEC2, p, x)
        return jnp.mean((yt + yx - 0.01 * yxx) ** 2)

    g = jax.grad(loss)(params)
    flat, _ = jax.flatten_util.ravel_pytree(g)
    assert jnp.all(jnp.isfinite(flat))
    assert float(jnp.abs(flat).max()) > 0.0

    def loss_jvp(p):
        _, yx, yt, yxx = derivs_2_jvp(lambda z: mlp_apply(SPEC2, p, z), x)
        return jnp.mean((yt + yx - 0.01 * yxx) ** 2)

    g2 = jax.grad(loss_jvp)(params)
    flat2, _ = jax.flatten_util.ravel_pytree(g2)
    np.testing.assert_allclose(flat, flat2, rtol=5e-3, atol=1e-5)


def test_taylor_jits_and_vmaps():
    params = init_mlp(jax.random.key(8), SPEC1)
    x = _points(jax.random.key(9), SPEC1, n=8)
    jit_out = jax.jit(lambda p, z: mlp_taylor_2(SPEC1, p, z)[3])(params, x)
    assert jit_out.shape == (8, 3)


def test_taylor2_stacked_matches():
    from pinns_tpu.ops.taylor import mlp_taylor_2_stacked

    params = init_mlp(jax.random.key(10), SPEC2)
    x = _points(jax.random.key(11), SPEC2)
    ref = mlp_taylor_2(SPEC2, params, x)
    out = mlp_taylor_2_stacked(SPEC2, params, x)
    for a, b in zip(ref, out):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    # gradients flow identically
    def loss(fn, p):
        _, yx, yt, yxx = fn(SPEC2, p, x)
        return jnp.mean((yt + yx - 0.01 * yxx) ** 2)

    g1, _ = jax.flatten_util.ravel_pytree(
        jax.grad(lambda p: loss(mlp_taylor_2, p))(params)
    )
    g2, _ = jax.flatten_util.ravel_pytree(
        jax.grad(lambda p: loss(mlp_taylor_2_stacked, p))(params)
    )
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=5e-3, atol=1e-6)


def test_taylor_mixed_bf16_close_to_f32_and_grads_stay_f32():
    """The mixed policy (bf16 hidden/derivative streams, f32 first layer +
    head accumulation) tracks the f32 pass to bf16-roundoff, and weight
    gradients arrive in the master dtype."""
    import dataclasses

    spec32 = MLPSpec(layers=(2, 32, 32, 32, 1), lb=(-1.0, 0.0), ub=(1.0, 1.0))
    specmx = dataclasses.replace(spec32, compute_dtype=jnp.bfloat16)
    assert specmx.mixed and not spec32.mixed
    params = init_mlp(jax.random.key(7), spec32)
    x = _points(jax.random.key(8), spec32, n=256)

    ref = mlp_taylor_2(spec32, params, x)
    mix = mlp_taylor_2(specmx, params, x)
    for r, m, tol in zip(ref, mix, (2e-2, 5e-2, 5e-2, 2e-1)):
        assert m.dtype == jnp.float32  # head accumulates into master dtype
        scale = float(jnp.max(jnp.abs(r))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(m) / scale, np.asarray(r) / scale, atol=tol
        )

    def loss(p):
        y, yx, yt, yxx = mlp_taylor_2(specmx, p, x)
        f = yt + y * yx - 0.01 * yxx
        return jnp.mean(f.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(l.dtype == jnp.float32 for l in leaves)
    g32 = jax.grad(
        lambda p: jnp.mean(
            (lambda o: o[2] + o[0] * o[1] - 0.01 * o[3])(
                mlp_taylor_2(spec32, p, x)
            )
            ** 2
        )
    )(params)
    flat_m = jax.flatten_util.ravel_pytree(g)[0]
    flat_r = jax.flatten_util.ravel_pytree(g32)[0]
    cos = jnp.vdot(flat_m, flat_r) / (
        jnp.linalg.norm(flat_m) * jnp.linalg.norm(flat_r) + 1e-12
    )
    assert float(cos) > 0.98  # gradient direction preserved


def test_taylor1_mixed_bf16():
    import dataclasses

    specmx = dataclasses.replace(SPEC1, compute_dtype=jnp.bfloat16)
    params = init_mlp(jax.random.key(0), SPEC1)
    x = _points(jax.random.key(1), SPEC1)
    ref = mlp_taylor_1(SPEC1, params, x)
    mix = mlp_taylor_1(specmx, params, x)
    for r, m in zip(ref, mix):
        assert m.dtype == jnp.float32
        scale = float(jnp.max(jnp.abs(r))) + 1e-6
        np.testing.assert_allclose(
            np.asarray(m) / scale, np.asarray(r) / scale, atol=5e-2
        )
