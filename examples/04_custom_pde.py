"""Extending the framework to a NEW PDE: the 1D heat equation.

The preset PDEs (Burgers, Euler) use the hand-optimized Taylor-mode
propagation, but any PDE composes from the generic nested-jvp operators in
``pinns_tpu.ops.derivatives`` — this example trains u_t = alpha u_xx with a
manufactured solution u(x,t) = sin(pi x) exp(-alpha pi^2 t), entirely from
the library's public pieces (MLP, sampler, L-BFGS).

    python examples/04_custom_pde.py
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pinns_tpu.data.sampling import uniform_box
from pinns_tpu.models.mlp import MLPSpec, init_mlp, mlp_apply
from pinns_tpu.opt.lbfgs import lbfgs_minimize_pytree
from pinns_tpu.ops.derivatives import derivs_2_jvp

ALPHA = 0.1
LB, UB = (0.0, 0.0), (1.0, 1.0)
spec = MLPSpec(layers=(2, 32, 32, 32, 1), lb=LB, ub=UB)


def exact(x):
    return np.sin(np.pi * x[:, 0:1]) * np.exp(-ALPHA * np.pi**2 * x[:, 1:2])


def heat_residual(params, pts):
    """u_t - alpha u_xx via the generic forward-over-forward operators."""
    u, _, u_t, u_xx = derivs_2_jvp(lambda z: mlp_apply(spec, params, z), pts)
    return u, u_t - ALPHA * u_xx


# supervised set: initial condition + boundaries (u=0 at x=0,1)
xs = np.linspace(0, 1, 101)[:, None].astype(np.float32)
ic = np.hstack([xs, np.zeros_like(xs)])
ts = np.linspace(0, 1, 101)[:, None].astype(np.float32)
bc = np.vstack([np.hstack([np.zeros_like(ts), ts]), np.hstack([np.ones_like(ts), ts])])
x_data = jnp.asarray(np.vstack([ic, bc]))
u_data = jnp.asarray(exact(np.vstack([ic, bc])).astype(np.float32))

params = init_mlp(jax.random.key(0), spec)
colloc = uniform_box(jax.random.key(1), 4000, LB, UB)


def loss_fn(p):
    u_pred = mlp_apply(spec, p, x_data)
    _, f = heat_residual(p, colloc)
    return jnp.mean((u_pred - u_data) ** 2) + jnp.mean(f * f)


opt = optax.adam(1e-3)
opt_state = opt.init(params)


@jax.jit
def step(p, s):
    g = jax.grad(loss_fn)(p)
    updates, s = opt.update(g, s, p)
    return optax.apply_updates(p, updates), s


for i in range(3000):
    params, opt_state = step(params, opt_state)

params, res = lbfgs_minimize_pytree(loss_fn, params, max_iters=2000)

# evaluate on a grid
xg, tg = np.meshgrid(np.linspace(0, 1, 101), np.linspace(0, 1, 101))
grid = jnp.asarray(np.stack([xg.ravel(), tg.ravel()], 1).astype(np.float32))
u_pred = np.asarray(mlp_apply(spec, params, grid))
u_star = exact(np.asarray(grid))
rel = np.linalg.norm(u_star - u_pred) / np.linalg.norm(u_star)
print(f"heat equation rel-L2 vs manufactured solution: {rel:.3e}")
assert rel < 1e-2, "custom-PDE example should reach <1% error"
