"""Residual operators vs independently-built autodiff formulations."""

import jax
import jax.numpy as jnp
import numpy as np

from pinns_tpu.models.mlp import MLPSpec, init_mlp, mlp_apply
from pinns_tpu.ops.derivatives import derivs_1_jvp, derivs_2_jvp
from pinns_tpu.ops.prox import soft_threshold
from pinns_tpu.ops.residuals import burgers_residual, euler_residuals

B_SPEC = MLPSpec(layers=(2, 20, 20, 20, 1), lb=(-1.0, 0.0), ub=(1.0, 1.0))
E_SPEC = MLPSpec(layers=(2, 24, 24, 3), lb=(0.0, 0.0), ub=(1.0, 0.2))


def test_burgers_residual_matches_jvp_formulation():
    params = init_mlp(jax.random.key(0), B_SPEC)
    x = jax.random.uniform(
        jax.random.key(1), (50, 2), minval=jnp.array([-1.0, 0.0]),
        maxval=jnp.array([1.0, 1.0]),
    )
    lam1, lam2 = 1.0, 0.01 / np.pi
    u, f = burgers_residual(B_SPEC, params, x, lam1, lam2)

    uu, ux, ut, uxx = derivs_2_jvp(lambda z: mlp_apply(B_SPEC, params, z), x)
    f_ref = ut + lam1 * uu * ux - lam2 * uxx
    np.testing.assert_allclose(u, uu, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(f, f_ref, rtol=1e-3, atol=1e-4)


def test_euler_residuals_match_product_rule_autodiff():
    """Reference computes d/dx of products (rho*u, rho*u^2, p, uE, up) by AD
    (Euler_ADMM.py:184-196); we expand by chain rule. Check both agree."""
    params = init_mlp(jax.random.key(2), E_SPEC)
    x = jax.random.uniform(
        jax.random.key(3), (40, 2), minval=jnp.array([0.0, 0.0]),
        maxval=jnp.array([1.0, 0.2]),
    )
    gamma = 1.4
    (rho, u, e), (f1, f2, f3) = euler_residuals(E_SPEC, params, x, gamma)

    # Reference-style: differentiate the products themselves.
    def fields(z):
        y = mlp_apply(E_SPEC, params, z)
        return y[:, 0:1], y[:, 1:2], y[:, 2:3]

    def products(z):
        r, v, en = fields(z)
        p = (gamma - 1.0) * (en - 0.5 * r * v * v)
        return jnp.concatenate(
            [r, r * v, r * v * v, p, v * en, v * p, en], axis=1
        )

    prods, dx, dt = derivs_1_jvp(products, x)
    rho_t = dt[:, 0:1]
    rhou_t = dt[:, 1:2]
    e_t = dt[:, 6:7]
    rhou_x = dx[:, 1:2]
    rhouu_x = dx[:, 2:3]
    p_x = dx[:, 3:4]
    ue_x = dx[:, 4:5]
    up_x = dx[:, 5:6]

    f1_ref = rho_t + rhou_x
    f2_ref = rhou_t + rhouu_x + p_x
    f3_ref = e_t + ue_x + up_x
    np.testing.assert_allclose(f1, f1_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(f2, f2_ref, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(f3, f3_ref, rtol=1e-3, atol=1e-4)


def test_soft_threshold():
    v = jnp.array([-2.0, -0.5, 0.0, 0.3, 1.5])
    out = soft_threshold(v, 1.0)
    np.testing.assert_allclose(out, [-1.0, 0.0, 0.0, 0.0, 0.5], atol=1e-7)

    # matches the reference's tf.where mask construction (Abgrall_ADMM.py:185-198)
    c = 0.025
    val = jnp.linspace(-0.1, 0.1, 21)
    ref = np.where(val > c, val - c, np.where(val < -c, val + c, 0.0))
    np.testing.assert_allclose(soft_threshold(val, c), ref, atol=1e-7)
