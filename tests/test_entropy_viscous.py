"""Viscosity-corrected entropy-admissibility penalties (VERDICT-r3 #7).

Exact viscous solutions satisfy U_t + F_x - lambda2 (u u_x)_x = -lambda2
u_x^2 <= 0 (Burgers) / eta_t + (q - visc eta_x)_x <= 0 (Euler, by convexity
of eta), so the corrected penalties must be ~zero on a manufactured exact
viscous solution — while the naive inviscid balance U_t + F_x = lambda2
u u_xx is provably POSITIVE in smooth regions there (the behavior the old
penalty wrongly punished). Pinned on the traveling-wave Burgers solution

    u(x, t) = c - a tanh(a (x - x0 - c t) / (2 nu)),

which a 1-hidden-unit tanh MLP represents EXACTLY (the domain-rescale is
inverted when constructing the weights), and on analytic jax derivatives of
eta for the Euler weak form.
"""

import jax
import jax.numpy as jnp
import numpy as np

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.models.mlp import MLPSpec, init_mlp
from pinns_tpu.ops.residuals import burgers_residual_aux
from pinns_tpu.ops.weakform import burgers_flux_residual, euler_flux_residuals
from pinns_tpu.train import Trainer

NU = 0.05
A, C = 1.0, 0.4
SPEC_TW = MLPSpec(layers=(2, 1, 1), lb=(-1.0, 0.0), ub=(1.0, 1.0))


def _traveling_wave_params(spec, a=A, c=C, nu=NU, x0=-0.2):
    """Exact tanh-MLP weights for u = c - a tanh(k (x - x0 - c t)), k =
    a/(2 nu), inverting the [-1,1] input rescale of models/mlp.py."""
    k = a / (2.0 * nu)
    lbx, lbt = spec.lb
    ubx, ubt = spec.ub
    sx, mx = (ubx - lbx) / 2.0, (ubx + lbx) / 2.0
    st, mt = (ubt - lbt) / 2.0, (ubt + lbt) / 2.0
    w1 = np.array([[k * sx], [-k * c * st]], dtype=np.float32)
    b1 = np.array([[k * (mx - x0 - c * mt)]], dtype=np.float32)
    w2 = np.array([[-a]], dtype=np.float32)
    b2 = np.array([[c]], dtype=np.float32)
    return [
        {"W": jnp.asarray(w1), "b": jnp.asarray(b1)},
        {"W": jnp.asarray(w2), "b": jnp.asarray(b2)},
    ]


def _front_points(n=400, x0=-0.2, c=C, seed=0):
    """Points clustered around the moving front (where the inviscid balance
    is materially positive) plus background coverage."""
    key1, key2 = jax.random.split(jax.random.key(seed))
    t = jax.random.uniform(key1, (n, 1), minval=0.05, maxval=0.95)
    dx = jax.random.uniform(key2, (n, 1), minval=-0.4, maxval=0.4)
    x = jnp.clip(x0 + c * t + dx, -0.95, 0.95)
    return jnp.concatenate([x, t], axis=1)


def _exact_wave(pts, a=A, c=C, nu=NU, x0=-0.2):
    z = (a / (2.0 * nu)) * (pts[:, 0:1] - x0 - c * pts[:, 1:2])
    return c - a * jnp.tanh(z)


def test_manufactured_wave_is_exact_and_solves_viscous_burgers():
    params = _traveling_wave_params(SPEC_TW)
    pts = _front_points()
    u, f, u_x, u_t = burgers_residual_aux(SPEC_TW, params, pts, 1.0, NU)
    np.testing.assert_allclose(
        np.asarray(u), np.asarray(_exact_wave(pts)), rtol=0, atol=1e-6
    )
    # exact solution: residual is zero up to f32 rounding of the k=10 wave
    assert float(jnp.max(jnp.abs(f))) < 5e-3
    # ... and the INVISCID entropy balance u u_t + u^2 u_x = nu u u_xx is
    # materially positive somewhere (u > 0 and u_xx > 0 ahead of the front)
    e_inv = u * u_t + u * u * u_x
    assert float(jnp.max(e_inv)) > 0.05


def test_strong_form_viscous_entropy_zero_on_exact_solution():
    """problem.entropy_sq with lambda2>0 must NOT penalize the exact viscous
    solution; the inviscid expression on the same points does."""
    exp = override(
        get_preset("abgrall_admm"),
        {
            "model.layers": (2, 1, 1),
            "pde.lambda2": NU,
            "loss.entropy_weight": 1.0,
            "loss.residual_kind": "mean_sq",
            "sampling.n_f": 64,
        },
    )
    tr = Trainer(exp)
    assert tr.problem.viscous_static
    spec = tr.problem.spec
    state = tr.init_state()
    params = dict(state.params)
    params["net"] = _traveling_wave_params(spec)
    pts = _front_points()
    ent = tr.problem.entropy_sq(params, pts)
    assert ent.shape == (pts.shape[0], 1)
    # corrected balance: u f - lambda2 u_x^2 <= O(f32 rounding) -> relu^2 ~ 0
    assert float(jnp.max(ent)) < 1e-5
    # the OLD inviscid form would have penalized these points hard
    u, _, u_x, u_t = burgers_residual_aux(spec, params["net"], pts, 1.0, NU)
    e_inv = u * u_t + u * u * u_x
    assert float(jnp.max(jnp.maximum(e_inv, 0.0) ** 2)) > 1e-3


def test_strong_form_inviscid_expression_unchanged():
    """lambda2 == 0 configs keep the literal inviscid expression (HLO
    stability for cached programs): entropy_sq == relu(u u_t + u^2 u_x)^2."""
    exp = override(
        get_preset("abgrall_admm"),
        {
            "model.layers": (2, 12, 1),
            "loss.entropy_weight": 1.0,
            "loss.residual_kind": "mean_sq",
            "sampling.n_f": 128,
        },
    )
    tr = Trainer(exp)
    assert not tr.problem.viscous_static
    state = tr.init_state()
    u, _, u_x, u_t = burgers_residual_aux(
        tr.problem.spec, state.params["net"], state.colloc, 1.0, 0.0
    )
    want = jnp.maximum(u * u_t + u * u * u_x, 0.0) ** 2
    got = tr.problem.entropy_sq(state.params, state.colloc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_weak_form_viscous_entropy_zero_on_exact_solution():
    params = _traveling_wave_params(SPEC_TW)
    centers = _front_points(n=200, seed=3)
    r, ent = burgers_flux_residual(
        SPEC_TW, params, centers, 1.0, NU, 0.02, 0.02,
        quad=8, want_entropy=True, viscous=True,
    )
    # conservation residual ~ 0 (cell means of an exact solution)
    assert float(jnp.max(jnp.abs(r))) < 2e-2
    # corrected weak entropy: no violation on the exact viscous solution
    assert float(jnp.max(ent)) < 1e-5
    # the inviscid weak entropy (viscous=False drops the entropy flux
    # correction) flags violations on the same exact solution
    _, ent_inv = burgers_flux_residual(
        SPEC_TW, params, centers, 1.0, NU, 0.02, 0.02,
        quad=8, want_entropy=True, viscous=False,
    )
    assert float(jnp.max(ent_inv)) > 1e-4


def test_euler_weak_viscous_entropy_matches_analytic_balance():
    """The corrected Euler weak entropy cell value converges to the
    pointwise balance eta_t + q_x - visc * eta_xx computed with exact jax
    derivatives of eta(net(x, t)) — i.e. the viscous entropy flux term is
    wired correctly (chain rule eta_U U_x = eta_x)."""
    spec = MLPSpec(layers=(2, 8, 3), lb=(-1.0, 0.0), ub=(1.0, 1.0))
    params = init_mlp(jax.random.key(5), spec)
    # shift outputs to a healthy gas state (rho ~ 1, u ~ 0.3, E ~ 2) so the
    # eps-clamps in the entropy never activate
    params[-1] = dict(params[-1])
    params[-1]["b"] = params[-1]["b"] + jnp.asarray([[1.0, 0.3, 2.0]])
    gamma, visc = 1.4, 0.03
    centers = jnp.asarray(
        [[0.2, 0.5], [-0.4, 0.3], [0.6, 0.7], [0.0, 0.25]]
    )

    def eta_fn(pt):
        from pinns_tpu.models.mlp import mlp_apply

        y = mlp_apply(spec, params, pt[None, :])[0]
        rho, u, e = y[0], y[1], y[2]
        p = (gamma - 1.0) * (e - 0.5 * rho * u * u)
        s = jnp.log(p) - gamma * jnp.log(rho)
        return -rho * s / (gamma - 1.0)

    def q_fn(pt):
        from pinns_tpu.models.mlp import mlp_apply

        y = mlp_apply(spec, params, pt[None, :])[0]
        return y[1] * eta_fn(pt)

    def balance(pt):
        g_eta = jax.grad(eta_fn)(pt)
        g_q = jax.grad(q_fn)(pt)
        eta_xx = jax.hessian(eta_fn)(pt)[0, 0]
        return g_eta[1] + g_q[0] - visc * eta_xx

    h = 1e-3
    _, ent = euler_flux_residuals(
        spec, params, centers, gamma, h, h,
        quad=4, want_entropy=True, visc=visc, viscous=True,
    )
    for i in range(centers.shape[0]):
        b = float(balance(centers[i]))
        expect = max(b, 0.0) ** 2
        np.testing.assert_allclose(
            float(ent[i, 0]), expect, rtol=2e-3, atol=1e-12
        )
