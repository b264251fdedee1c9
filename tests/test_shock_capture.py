"""Shock-capture formulation knobs (beyond-reference; LossConfig):
gradient-weighted residuals and the Burgers entropy-admissibility penalty."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer
from pinns_tpu.train.trainer import make_loss_fn

HAVE_REF = os.path.isdir("/root/reference")
pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")


def _small(preset, **updates):
    exp = get_preset(preset)
    base = {
        "train.epochs": 200,
        "train.chunk": 100,
        "sampling.n_f": 256,
        "model.layers": (2, 12, 12, 1),
    }
    base.update(updates)
    return override(exp, base)


def test_grad_weight_scales_residual_field():
    """problem.residuals with kappa>0 must equal f / (1 + kappa*u_x^2)."""
    from pinns_tpu.ops.residuals import burgers_residual_aux

    kappa = 25.0
    tr0 = Trainer(_small("abgrall_admm"))
    trw = Trainer(_small("abgrall_admm", **{"loss.grad_weight_kappa": kappa}))
    state = tr0.init_state()
    colloc = state.colloc

    f0 = tr0.problem.residuals(state.params, colloc)
    fw = trw.problem.residuals(state.params, colloc)
    _, _, u_x, _ = burgers_residual_aux(
        tr0.problem.spec, state.params["net"], colloc, 1.0, 0.0
    )
    np.testing.assert_allclose(
        np.asarray(fw),
        np.asarray(f0 / (1.0 + kappa * u_x**2)),
        rtol=1e-6,
        atol=1e-7,
    )
    # the weighted field is strictly damped at steep-gradient points
    assert float(jnp.max(jnp.abs(fw))) <= float(jnp.max(jnp.abs(f0))) + 1e-7


def test_grad_weight_euler_tuple():
    kappa = 10.0
    tr0 = Trainer(_small("euler_admm", **{"model.layers": (2, 16, 16, 3)}))
    trw = Trainer(
        _small(
            "euler_admm",
            **{
                "model.layers": (2, 16, 16, 3),
                "loss.grad_weight_kappa": kappa,
            },
        )
    )
    state = tr0.init_state()
    f0 = tr0.problem.residuals(state.params, state.colloc)
    fw = trw.problem.residuals(state.params, state.colloc)
    assert isinstance(fw, tuple) and len(fw) == 3
    # all three components share ONE weight field: ratios must agree
    r0 = np.asarray(fw[0] / f0[0])
    for i in (1, 2):
        np.testing.assert_allclose(
            np.asarray(fw[i] / f0[i]), r0, rtol=1e-4, atol=1e-5
        )
    assert np.all(r0 <= 1.0 + 1e-6) and np.all(r0 > 0.0)


def test_entropy_sq_nonnegative_and_wired():
    tr = Trainer(
        _small(
            "abgrall_admm",
            **{"loss.entropy_weight": 0.5, "loss.residual_kind": "mean_sq"},
        )
    )
    state = tr.init_state()
    ent = tr.problem.entropy_sq(state.params, state.colloc)
    assert ent.shape == (256, 1)
    assert float(jnp.min(ent)) >= 0.0
    # the loss with the penalty is >= the loss without it (same params)
    loss_w, _ = make_loss_fn(tr.problem)(state.params, state.colloc, state.admm)
    tr0 = Trainer(_small("abgrall_admm", **{"loss.residual_kind": "mean_sq"}))
    loss_0, _ = make_loss_fn(tr0.problem)(state.params, state.colloc, None)
    assert float(loss_w) >= float(loss_0) - 1e-7


@pytest.mark.parametrize("kind", ["mean_sq", "admm", "l1_sq_norm"])
def test_microbatch_matches_full_batch_with_shock_terms(kind):
    """Microbatching is pure scheduling: with kappa and entropy_weight on,
    the loss must match the unbatched evaluation for every residual kind."""
    def build(m):
        return Trainer(
            _small(
                "abgrall_admm",
                **{
                    "loss.residual_kind": kind,
                    "loss.grad_weight_kappa": 5.0,
                    "loss.entropy_weight": 0.3,
                    "sampling.microbatch": m,
                },
            )
        )

    tr1, tr4 = build(1), build(4)
    state = tr1.init_state()
    admm = state.admm
    l1, _ = make_loss_fn(tr1.problem)(state.params, state.colloc, admm)
    l4, _ = make_loss_fn(tr4.problem)(state.params, state.colloc, admm)
    np.testing.assert_allclose(float(l1), float(l4), rtol=2e-5)


def test_euler_entropy_penalty_wired_and_matches_fd():
    """Euler entropy production S_t + u S_x (S = log p - gamma log rho):
    chain-rule expansion must match a float64 finite-difference of S along
    (x, t) computed from the raw network outputs."""
    from pinns_tpu.ops.residuals import euler_entropy_production
    from pinns_tpu.ops.taylor import mlp_taylor_1
    from pinns_tpu.models.mlp import mlp_apply

    exp = _small(
        "euler_admm",
        **{"model.layers": (2, 16, 16, 3), "loss.entropy_weight": 1.0},
    )
    tr = Trainer(exp)
    state = tr.init_state()
    spec, net = tr.problem.spec, state.params["net"]
    pts = state.colloc[:64]
    y, y_x, y_t = mlp_taylor_1(spec, net, pts)
    d = np.asarray(euler_entropy_production(y, y_x, y_t, 1.4))

    def entropy(xy):
        out = np.asarray(mlp_apply(spec, net, jnp.asarray(xy)), np.float64)
        rho, u, e = out[:, 0], out[:, 1], out[:, 2]
        p = 0.4 * (e - 0.5 * rho * u * u)
        return np.log(np.maximum(p, 1e-3)) - 1.4 * np.log(
            np.maximum(rho, 1e-3)
        )

    h = 1e-3
    xy = np.asarray(pts, np.float64)
    s_x = (entropy(xy + [h, 0]) - entropy(xy - [h, 0])) / (2 * h)
    s_t = (entropy(xy + [0, h]) - entropy(xy - [0, h])) / (2 * h)
    u_val = np.asarray(y[:, 1])
    d_fd = s_t + u_val * s_x
    # compare where the clamp is inactive (physical states)
    out = np.asarray(mlp_apply(spec, net, pts))
    rho, u_, e_ = out[:, 0], out[:, 1], out[:, 2]
    p = 0.4 * (e_ - 0.5 * rho * u_ * u_)
    mask = (p > 1e-2) & (rho > 1e-2)
    assert mask.sum() > 5
    np.testing.assert_allclose(d[mask, 0], d_fd[mask], rtol=2e-2, atol=2e-3)

    # and the penalty trains: short run stays finite
    state, summary = tr.train(state)
    for f in ("rho", "u", "E"):
        assert np.isfinite(summary[f"rel_l2_{f}"])


def test_short_training_with_shock_terms_learns():
    tr = Trainer(
        _small(
            "abgrall_admm",
            **{
                "loss.grad_weight_kappa": 10.0,
                "loss.entropy_weight": 1.0,
            },
        )
    )
    state = tr.init_state()
    state, summary = tr.train(state)
    assert np.isfinite(summary["rel_l2_u"])
    assert summary["rel_l2_u"] < 1.5


# --- RAD sampling (SamplingConfig strategy='rad') --------------------------


def test_rad_training_runs_and_redraws_between_chunks():
    tr = Trainer(
        _small(
            "abgrall_admm",
            **{
                "sampling.strategy": "rad",
                "sampling.rad_pool_factor": 4,
                "train.epochs": 200,
                "train.chunk": 100,
            },
        )
    )
    state = tr.init_state()
    c0 = np.asarray(state.colloc).copy()
    state, summary = tr.train(state)
    assert np.isfinite(summary["rel_l2_u"])
    # the batch was re-drawn at least once (RAD fires at chunk boundaries)
    assert not np.allclose(np.asarray(state.colloc), c0)
    # ADMM state re-initialized at the new points and finite
    assert np.all(np.isfinite(np.asarray(state.admm.z)))


def test_rad_concentrates_on_high_residual_points():
    """The importance sampler must oversample high-|f| regions. A PINN's
    residual landscape at init is nearly flat, so pin the math with a
    synthetic residual field f = x instead: with k=2, c=0 the sampled
    batch's mean x^2 must approach E[x^2 * p(x)] = E[x^4]/E[x^2]
    (0.6 for x~U[-1,1]), well above the uniform 1/3."""
    tr = Trainer(
        _small(
            "abgrall_admm",
            **{
                "sampling.strategy": "rad",
                "sampling.rad_pool_factor": 8,
                "sampling.rad_k": 2.0,
                "sampling.rad_c": 0.0,
            },
        )
    )
    tr.problem.residuals = lambda params, colloc: colloc[:, 0:1]
    state = tr.init_state()
    new_state = tr._get_rad_resample()(state)
    x = np.asarray(new_state.colloc[:, 0])
    # domain is x in [-1, 1]: uniform E[x^2] = 1/3, RAD-weighted = 3/5
    assert float(np.mean(x**2)) > 0.5
    # and the batch stayed inside the domain
    assert x.min() >= -1.0 - 1e-6 and x.max() <= 1.0 + 1e-6


def test_rad_rejected_in_ensemble_path():
    from pinns_tpu.parallel.ensemble import make_ensemble_chunk

    tr = Trainer(_small("abgrall_admm", **{"sampling.strategy": "rad"}))
    with pytest.raises(ValueError, match="rad"):
        make_ensemble_chunk(tr, 10)
