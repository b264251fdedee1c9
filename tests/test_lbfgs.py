import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinns_tpu.opt.lbfgs import lbfgs_minimize, lbfgs_minimize_pytree


def test_quadratic_exact():
    """Convex quadratic: L-BFGS should hit the optimum fast."""
    a = jnp.array([1.0, 10.0, 100.0, 3.0])
    b = jnp.array([1.0, -2.0, 0.5, 4.0])

    def fun(x):
        return 0.5 * jnp.sum(a * (x - b) ** 2)

    res = jax.jit(lambda x0: lbfgs_minimize(fun, x0, max_iters=100))(
        jnp.zeros(4)
    )
    np.testing.assert_allclose(res.x, b, rtol=1e-4, atol=1e-4)
    assert bool(res.converged)


def test_rosenbrock():
    def rosen(x):
        return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)

    x0 = jnp.array([-1.2, 1.0, -1.2, 1.0, 0.5], dtype=jnp.float32)
    res = jax.jit(
        lambda z: lbfgs_minimize(rosen, z, max_iters=500, gtol=1e-5)
    )(x0)
    np.testing.assert_allclose(res.x, jnp.ones(5), rtol=1e-3, atol=1e-3)
    assert float(res.f) < 1e-7


def test_matches_scipy_on_logsumexp():
    """Compare final objective against scipy L-BFGS-B on a smooth convex fn."""
    import scipy.optimize

    rng = np.random.default_rng(0)
    a_np = rng.standard_normal((20, 8)).astype(np.float64)
    b_np = rng.standard_normal(20).astype(np.float64)
    a = jnp.asarray(a_np, jnp.float32)
    b = jnp.asarray(b_np, jnp.float32)

    def fun(x):
        return jax.nn.logsumexp(a @ x - b) + 0.01 * jnp.sum(x * x)

    res = jax.jit(lambda z: lbfgs_minimize(fun, z, max_iters=200))(jnp.zeros(8))

    def fun_np(x):
        z = a_np @ x - b_np
        m = z.max()
        return m + np.log(np.exp(z - m).sum()) + 0.01 * (x * x).sum()

    sp = scipy.optimize.minimize(fun_np, np.zeros(8), method="L-BFGS-B")
    assert abs(float(res.f) - sp.fun) < 1e-4


def test_pytree_frontend():
    def loss(p):
        return jnp.sum((p["w"] - 3.0) ** 2) + jnp.sum((p["b"] + 1.0) ** 2)

    params = {"w": jnp.zeros((3, 2)), "b": jnp.zeros(5)}
    out, res = lbfgs_minimize_pytree(loss, params, max_iters=50)
    np.testing.assert_allclose(out["w"], 3.0, atol=1e-4)
    np.testing.assert_allclose(out["b"], -1.0, atol=1e-4)


def test_already_converged_start():
    def fun(x):
        return jnp.sum(x * x)

    res = lbfgs_minimize(fun, jnp.zeros(3), max_iters=10)
    assert bool(res.converged)
    assert int(res.n_iters) == 0
