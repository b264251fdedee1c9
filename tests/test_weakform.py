"""Weak-form control-volume residuals (LossConfig.residual_kind='flux'):
quadrature correctness vs dense numerical integration, smooth-limit
consistency with the strong-form residuals, entropy-inequality sign, config
validation, and training smokes for both PDEs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.models.mlp import MLPSpec, init_mlp, mlp_apply
from pinns_tpu.ops.residuals import burgers_residual, euler_residuals
from pinns_tpu.ops.weakform import (
    burgers_flux_residual,
    euler_flux_residuals,
)
from pinns_tpu.train import Trainer

SPEC1 = MLPSpec(layers=(2, 16, 16, 1), lb=(-1.0, 0.0), ub=(1.0, 1.0))
SPEC3 = MLPSpec(layers=(2, 16, 16, 3), lb=(-1.0, 0.0), ub=(1.0, 1.0))


def _centers(n=64, seed=2, margin=0.1):
    return jax.random.uniform(
        jax.random.key(seed), (n, 2),
        minval=jnp.array([-1.0 + margin, margin]),
        maxval=jnp.array([1.0 - margin, 1.0 - margin]),
    )


def test_flux_matches_strong_residual_in_smooth_limit():
    """For a smooth (random-init) network the cell-mean conservation
    residual equals the strong residual at the center to O(h^2)."""
    params = init_mlp(jax.random.key(0), SPEC1)
    centers = _centers()
    _, f_strong = burgers_residual(SPEC1, params, centers, 1.0, 0.0031831)
    errs = []
    for h in (0.04, 0.02, 0.01):
        r, _ = burgers_flux_residual(
            SPEC1, params, centers, 1.0, 0.0031831, h, h,
            quad=4, viscous=True,
        )
        errs.append(np.max(np.abs(np.asarray(r - f_strong))))
    assert errs[-1] < 2e-3
    # ~4x error reduction per halving (second order)
    assert errs[0] / errs[-1] > 8.0


def test_flux_quadrature_matches_dense_integration():
    """GL edge quadrature + measure normalization vs a dense trapezoid
    integration of the same network on one cell."""
    params = init_mlp(jax.random.key(1), SPEC1)
    xc, tc, h = 0.3, 0.5, 0.07
    r, _ = burgers_flux_residual(
        SPEC1, params, jnp.array([[xc, tc]]), 1.0, 0.0, h, h,
        quad=6, viscous=False,
    )
    xs = np.linspace(xc - h, xc + h, 4001)
    ts = np.linspace(tc - h, tc + h, 4001)

    def u(x, t):
        pts = jnp.stack([jnp.asarray(x), jnp.asarray(t)], axis=-1).reshape(-1, 2)
        return np.asarray(mlp_apply(SPEC1, params, pts))[:, 0]

    top = np.trapezoid(u(xs, np.full_like(xs, tc + h)), xs)
    bot = np.trapezoid(u(xs, np.full_like(xs, tc - h)), xs)
    rig = np.trapezoid(0.5 * u(np.full_like(ts, xc + h), ts) ** 2, ts)
    lef = np.trapezoid(0.5 * u(np.full_like(ts, xc - h), ts) ** 2, ts)
    expected = (top - bot + rig - lef) / (4.0 * h * h)
    np.testing.assert_allclose(float(r[0, 0]), expected, rtol=1e-3, atol=1e-5)


def test_euler_flux_matches_strong_residuals():
    params = init_mlp(jax.random.key(3), SPEC3)
    centers = _centers(seed=4)
    _, f_strong = euler_residuals(SPEC3, params, centers, 1.4)
    (r1, r2, r3), ent = euler_flux_residuals(
        SPEC3, params, centers, 1.4, 0.01, 0.01, quad=4, want_entropy=True
    )
    for r, f in zip((r1, r2, r3), f_strong):
        np.testing.assert_allclose(
            np.asarray(r), np.asarray(f), rtol=0.05, atol=5e-3
        )
    assert ent.shape == (centers.shape[0], 1)
    assert np.all(np.asarray(ent) >= 0.0)


def test_euler_viscous_flux_smooth_limit():
    """With artificial viscosity the cell-mean residual converges to
    f_strong_i - nu * dU_i/dx_x (U the conserved variables): the viscous
    flux is -nu U_x, so the smooth limit gains -nu U_xx, checked against a
    central finite difference of the Taylor-exact U_x."""
    from pinns_tpu.ops.taylor import mlp_taylor_1

    params = init_mlp(jax.random.key(3), SPEC3)
    centers = _centers(seed=4)
    nu = 0.05
    _, f_strong = euler_residuals(SPEC3, params, centers, 1.4)

    def cons_x(pts):
        y, y_x, _ = mlp_taylor_1(SPEC3, params, pts)
        rho, u = y[:, 0:1], y[:, 1:2]
        rho_x, u_x, e_x = y_x[:, 0:1], y_x[:, 1:2], y_x[:, 2:3]
        return jnp.concatenate([rho_x, rho_x * u + rho * u_x, e_x], axis=1)

    d = 1e-3
    off = jnp.array([[d, 0.0]])
    cons_xx = (cons_x(centers + off) - cons_x(centers - off)) / (2 * d)

    rs, _ = euler_flux_residuals(
        SPEC3, params, centers, 1.4, 0.01, 0.01, quad=4,
        visc=nu, viscous=True,
    )
    for i, (r, f) in enumerate(zip(rs, f_strong)):
        expect = np.asarray(f) - nu * np.asarray(cons_xx[:, i : i + 1])
        np.testing.assert_allclose(np.asarray(r), expect, rtol=0.05, atol=5e-3)


def test_euler_viscous_zero_matches_inviscid():
    """visc=0 through the viscous (Taylor-1) path reproduces the pure
    forward-pass inviscid residuals."""
    params = init_mlp(jax.random.key(7), SPEC3)
    centers = _centers(seed=11, n=32)
    r0, _ = euler_flux_residuals(
        SPEC3, params, centers, 1.4, 0.02, 0.02, quad=4,
    )
    rv, _ = euler_flux_residuals(
        SPEC3, params, centers, 1.4, 0.02, 0.02, quad=4,
        visc=0.0, viscous=True,
    )
    for a, b in zip(r0, rv):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_cells_clip_to_domain():
    """Centers on the boundary produce clipped (smaller) cells, not
    out-of-domain evaluations; residuals stay finite."""
    params = init_mlp(jax.random.key(5), SPEC1)
    centers = jnp.array([[-1.0, 0.0], [1.0, 1.0], [0.0, 0.0]])
    r, _ = burgers_flux_residual(
        SPEC1, params, centers, 1.0, 0.0, 0.05, 0.05, viscous=False
    )
    assert np.all(np.isfinite(np.asarray(r)))


def test_flux_scale_param_coarsens_cells():
    """Problem.flux_residuals_and_entropy(scale=s) must equal the direct
    weakform call with s-times the configured half-widths — the contract
    the multi-scale selection battery (selection_scores(coarse_scales=...))
    is built on. scale=1.0 takes the guarded no-op path (default-config
    HLO stays bit-identical, CLAUDE.md cache rule)."""
    exp = override(get_preset("twosin_weak"), {
        "model.layers": (2, 16, 16, 1),
        "train.epochs": 10, "train.chunk": 10, "sampling.n_f": 64,
    })
    tr = Trainer(exp)
    problem = tr.problem
    params = tr.init_state(seed=3).params
    centers = _centers(n=32, seed=9).astype(problem.spec.dtype)
    cfg = exp.loss
    hx = cfg.flux_dx_frac * float(problem.ub[0] - problem.lb[0])
    ht = cfg.flux_dt_frac * float(problem.ub[1] - problem.lb[1])
    for s in (1.0, 4.0):
        r, ent = problem.flux_residuals_and_entropy(
            params, centers, True, scale=s
        )
        r_direct, ent_direct = burgers_flux_residual(
            problem.spec, params["net"], centers,
            exp.pde.lambda1, exp.pde.lambda2, hx * s, ht * s,
            quad=cfg.flux_quad, want_entropy=True, viscous=True,
        )
        np.testing.assert_allclose(np.asarray(r), np.asarray(r_direct),
                                   rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(np.asarray(ent), np.asarray(ent_direct),
                                   rtol=1e-6, atol=1e-7)
    # coarse cells average over more of the field: residuals must differ
    r1, _ = problem.flux_residuals_and_entropy(params, centers, False)
    r4, _ = problem.flux_residuals_and_entropy(params, centers, False,
                                               scale=4.0)
    assert not np.allclose(np.asarray(r1), np.asarray(r4))


def test_flux_rejects_grad_weighting():
    exp = override(get_preset("abgrall_admm"), {
        "loss.residual_kind": "flux",
        "loss.grad_weight_kappa": 1.0,
        "train.epochs": 10,
        "train.chunk": 10,
        "sampling.n_f": 64,
    })
    with pytest.raises(ValueError, match="strong-form"):
        Trainer(exp).train()


def test_flux_training_smoke_burgers():
    exp = override(get_preset("abgrall_admm"), {
        "model.layers": (2, 16, 16, 1),
        "loss.residual_kind": "flux",
        "loss.entropy_weight": 1.0,
        "optimizer.kind": "adam",
        "train.epochs": 200,
        "train.chunk": 100,
        "sampling.n_f": 256,
    })
    _, summary = Trainer(exp).train()
    assert np.isfinite(summary["rel_l2_u"])


def test_admm_over_flux_training_smoke():
    """loss.admm_form='flux': the reference's L1/ADMM machinery regularizes
    the weak-form residual — init, penalty, z/dual updates, and misfit all
    run on cell residuals."""
    exp = override(get_preset("abgrall_admm"), {
        "model.layers": (2, 16, 16, 1),
        "loss.admm_form": "flux",
        "optimizer.kind": "adam",
        "train.epochs": 200,
        "train.chunk": 100,
        "sampling.n_f": 256,
    })
    tr = Trainer(exp)
    state = tr.init_state()
    assert state.admm is not None
    state, summary = tr.train(state)
    assert np.isfinite(summary["rel_l2_u"])
    assert np.all(np.isfinite(np.asarray(state.admm.z)))


def test_admm_flux_rejects_microbatch():
    exp = override(get_preset("abgrall_admm"), {
        "loss.admm_form": "flux",
        "sampling.microbatch": 2,
        "train.epochs": 10,
        "train.chunk": 10,
        "sampling.n_f": 64,
    })
    with pytest.raises(ValueError, match="admm_form"):
        Trainer(exp).train()


def test_flux_viscous_flag_respects_exp_transform():
    """lambda2_transform='exp' means the effective viscosity is exp(raw) > 0
    even when the raw lambda2 is 0 — the flux path must include the
    -lambda2 u_x flux (regression: the static `viscous` flag used to test
    the RAW value only)."""
    from pinns_tpu.train.trainer import build_problem

    exp = override(get_preset("abgrall_admm"), {
        "model.layers": (2, 8, 8, 1),
        "loss.residual_kind": "flux",
        "pde.lambda2": 0.0,
        "pde.lambda2_transform": "exp",  # effective lambda2 = exp(0) = 1
    })
    problem = build_problem(exp)
    params = {
        "net": init_mlp(jax.random.key(0), problem.spec),
        "coeffs": {"lambda1": jnp.ones((1,)), "lambda2": jnp.zeros((1,))},
    }
    centers = _centers(n=16, seed=9)
    r_full, _ = problem.flux_residuals_and_entropy(params, centers, False)
    r_invisc, _ = burgers_flux_residual(
        problem.spec, params["net"], centers, 1.0, 1.0,
        0.04, 0.02, quad=4, viscous=False,
    )
    assert np.max(np.abs(np.asarray(r_full - r_invisc))) > 1e-4


def test_strong_equations_mixes_forms():
    """loss.strong_equations=(0,) on Euler: equation 0 is the exact strong
    pointwise residual, equations 1-2 stay the weak cell means; training
    smoke stays finite; Burgers rejects the knob."""
    from pinns_tpu.train.trainer import build_problem

    exp = override(get_preset("euler_admm"), {
        "model.layers": (2, 8, 8, 3),
        "loss.residual_kind": "flux",
        "loss.strong_equations": (0,),
    })
    problem = build_problem(exp)
    params = {
        "net": init_mlp(jax.random.key(1), problem.spec),
        "coeffs": {"lambda1": jnp.ones((1,)), "lambda2": jnp.zeros((1,))},
    }
    centers = _centers(n=16, seed=5)
    mixed, _ = problem.flux_residuals_and_entropy(params, centers, False)
    strong, _ = problem.residuals_and_entropy(params, centers, False)
    np.testing.assert_allclose(
        np.asarray(mixed[0]), np.asarray(strong[0]), rtol=1e-6, atol=1e-7
    )
    # momentum/energy stay weak-form: differ from strong at a random net
    assert np.max(np.abs(np.asarray(mixed[1] - strong[1]))) > 1e-6

    exp_t = override(get_preset("euler_admm"), {
        "model.layers": (2, 8, 8, 3),
        "loss.residual_kind": "flux",
        "loss.strong_equations": (0,),
        "train.epochs": 10,
        "train.chunk": 10,
        "sampling.n_f": 64,
        "data.n_u": 32,
    })
    state, s = Trainer(exp_t).train()
    assert all(np.isfinite(v) for k, v in s.items() if k.startswith("rel_l2"))

    exp_b = override(get_preset("abgrall_admm"), {
        "loss.residual_kind": "flux",
        "loss.strong_equations": (0,),
        "train.epochs": 10,
        "train.chunk": 10,
        "sampling.n_f": 64,
    })
    with pytest.raises(ValueError, match="strong_equations"):
        Trainer(exp_b).train()


def test_unknown_admm_form_raises():
    exp = override(get_preset("abgrall_admm"), {
        "loss.admm_form": "Flux",  # typo: must not silently fall back
        "train.epochs": 10,
        "train.chunk": 10,
        "sampling.n_f": 64,
    })
    with pytest.raises(ValueError, match="admm_form"):
        Trainer(exp).train()


def test_rad_scores_with_flux_residuals():
    """strategy='rad' + residual_kind='flux' trains with the importance
    pool scored by the weak-form cell residuals (the trained objective)."""
    exp = override(get_preset("abgrall_admm"), {
        "model.layers": (2, 16, 16, 1),
        "loss.residual_kind": "flux",
        "sampling.strategy": "rad",
        "optimizer.kind": "adam",
        "train.epochs": 200,
        "train.chunk": 100,
        "sampling.n_f": 128,
    })
    _, summary = Trainer(exp).train()
    assert np.isfinite(summary["rel_l2_u"])


def test_weak_presets_build_and_train():
    """The shipped weak-form research presets (twosin_weak, euler_weak)
    construct and train end-to-end at toy scale."""
    for name, layers in (
        ("twosin_weak", (2, 16, 16, 1)),
        ("euler_weak", (2, 20, 20, 3)),
        ("euler_weak_fast", (2, 20, 20, 3)),
    ):
        exp = override(get_preset(name), {
            "model.layers": layers,
            "train.epochs": 100,
            "train.chunk": 50,
            "sampling.n_f": 128,
            "sampling.t_curriculum_epochs": 0,
        })
        _, summary = Trainer(exp).train()
        assert all(np.isfinite(v) for k, v in summary.items()
                   if k.startswith("rel_l2")), name


def test_flux_training_smoke_euler_with_causal():
    exp = override(get_preset("euler_admm"), {
        "model.layers": (2, 20, 20, 3),
        "loss.residual_kind": "flux",
        "loss.causal_eps": 1.0,
        "loss.causal_bins": 8,
        "optimizer.kind": "adam",
        "train.epochs": 100,
        "train.chunk": 50,
        "sampling.n_f": 128,
    })
    _, summary = Trainer(exp).train()
    for k in ("rel_l2_rho", "rel_l2_u", "rel_l2_E"):
        assert np.isfinite(summary[k])
