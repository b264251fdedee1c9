import jax.numpy as jnp
import numpy as np

from pinns_tpu.losses.admm import (
    ADMMState,
    admm_init,
    admm_misfit,
    admm_penalty,
    admm_update,
)
from pinns_tpu.losses.misfit import data_misfit, residual_penalty


def test_data_misfit_kinds():
    pred = jnp.array([[1.0], [2.0], [3.0]])
    tgt = jnp.array([[0.0], [0.0], [0.0]])
    # (1/N)||r||^2 with N_u normalizer
    np.testing.assert_allclose(
        data_misfit(pred, tgt, "mse_sum", 3), (1 + 4 + 9) / 3, rtol=1e-6
    )
    # unsquared 2-norm (Hwan_L2 variant)
    np.testing.assert_allclose(
        data_misfit(pred, tgt, "l2_norm", 3), np.sqrt(14.0), rtol=1e-6
    )


def test_residual_penalty_kinds():
    f = jnp.array([[1.0], [-2.0], [2.0]])
    np.testing.assert_allclose(residual_penalty(f, "mean_sq", 3), 3.0, rtol=1e-6)
    np.testing.assert_allclose(
        residual_penalty(f, "l2_sq_norm", 3), 9.0 / 3, rtol=1e-6
    )
    np.testing.assert_allclose(
        residual_penalty(f, "l1_sq_norm", 3), 25.0 / 3, rtol=1e-6
    )


def test_admm_single_residual_cycle():
    n_f, rho = 4, 10.0
    f = jnp.array([[0.5], [-0.3], [0.01], [0.0]])
    st = admm_init(f)
    np.testing.assert_array_equal(st.z, f)
    np.testing.assert_array_equal(st.dual, jnp.ones_like(f))

    pen = admm_penalty(f, st, rho)
    # z == f so q = dual/rho
    expect = 0.5 * rho * np.sum((np.ones((4, 1)) / rho) ** 2)
    np.testing.assert_allclose(pen, expect, rtol=1e-6)

    st2 = admm_update(f, st, rho, n_f)
    c = 1.0 / (rho * n_f)
    val = np.asarray(f) + 1.0 / rho
    z_ref = np.where(val > c, val - c, np.where(val < -c, val + c, 0.0))
    np.testing.assert_allclose(st2.z, z_ref, rtol=1e-6)
    np.testing.assert_allclose(
        st2.dual, 1.0 + rho * (np.asarray(f) - z_ref), rtol=1e-6
    )
    assert float(admm_misfit(f, st2)) >= 0.0


def test_admm_multi_residual():
    f = (jnp.ones((5, 1)), jnp.zeros((5, 1)), -jnp.ones((5, 1)))
    st = admm_init(f)
    assert isinstance(st.z, tuple) and len(st.z) == 3
    pen = admm_penalty(f, st, 40.0)
    assert pen.shape == ()
    st2 = admm_update(f, st, 40.0, 5)
    assert len(st2.dual) == 3


def test_admm_drives_l1_sparsity():
    """On the toy problem min_w ||w - a||^2/N + (1/N)||w||_1 split via ADMM
    (w ~ r(w)), iterates converge to the prox solution."""
    n, rho = 8, 5.0
    a = jnp.asarray(np.linspace(-0.2, 0.2, n).reshape(-1, 1), jnp.float32)

    w = jnp.zeros((n, 1))
    st = ADMMState(z=w, dual=jnp.zeros((n, 1)))
    for _ in range(200):
        # exact w-minimization of ||w-a||^2/n + rho/2 ||w - z + dual/rho||^2
        w = (2.0 / n * a + rho * (st.z - st.dual / rho)) / (2.0 / n + rho)
        st = admm_update(w, st, rho, n)
    # analytic solution: soft-threshold of a at 1/2 * (1/n)/(2/n) = 0.5... :
    # min (1/n)||w-a||^2 + (1/n)||w||_1 => w* = soft(a, 1/2)
    ref = np.sign(np.asarray(a)) * np.maximum(np.abs(np.asarray(a)) - 0.5, 0)
    np.testing.assert_allclose(np.asarray(w), ref, atol=1e-3)


def test_admm_penalty_explicit_inner():
    f = jnp.array([[1.0], [2.0]])
    st = ADMMState(z=jnp.zeros((2, 1)), dual=jnp.ones((2, 1)) * 3.0)
    rho = 2.0
    base = admm_penalty(f, st, rho)
    withi = admm_penalty(f, st, rho, explicit_inner=True)
    np.testing.assert_allclose(withi - base, 3.0 * (1.0 + 2.0), rtol=1e-6)
