"""Causal-in-time residual weighting (LossConfig.causal_eps; Wang, Sankaran
& Perdikaris 2022): weight semantics, system (tuple) residuals, config
validation, and a training smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.losses.misfit import causal_residual_penalty
from pinns_tpu.train import Trainer


def _batch(n=512, seed=0):
    key = jax.random.key(seed)
    kx, kf = jax.random.split(key)
    t = jax.random.uniform(kx, (n,), minval=0.0, maxval=1.0)
    f = jax.random.normal(kf, (n, 1))
    return t, f


def test_eps_zero_is_plain_bin_average():
    t, f = _batch()
    term, w = causal_residual_penalty(f, t, 0.0, 1.0, eps=0.0, bins=16)
    np.testing.assert_allclose(np.asarray(w), 1.0)
    # equals the average of per-bin mean squares
    idx = np.clip((np.asarray(t) * 16).astype(int), 0, 15)
    sq = np.asarray(f[:, 0]) ** 2
    l_b = np.array([sq[idx == b].mean() if (idx == b).any() else 0.0
                    for b in range(16)])
    np.testing.assert_allclose(float(term), l_b.mean(), rtol=1e-5)


def test_weights_causal_monotone():
    t, f = _batch()
    # inflate late-time residuals; weights must still be driven by EARLIER
    # bins only, start at exactly 1, and never increase
    f = f * (1.0 + 10.0 * t[:, None])
    term, w = causal_residual_penalty(f, t, 0.0, 1.0, eps=1.0, bins=16)
    w = np.asarray(w)
    assert w[0] == 1.0
    assert np.all(np.diff(w) <= 1e-7)
    assert w[-1] < 0.5  # the inflated early losses suppress late bins
    assert np.isfinite(float(term))


def test_system_residuals_share_weights():
    t, f = _batch()
    f2 = 2.0 * f
    term_pair, w_pair = causal_residual_penalty(
        (f, f2), t, 0.0, 1.0, eps=0.0, bins=8
    )
    term_sum, _ = causal_residual_penalty(
        jnp.sqrt(f * f + f2 * f2), t, 0.0, 1.0, eps=0.0, bins=8
    )
    np.testing.assert_allclose(float(term_pair), float(term_sum), rtol=1e-5)
    assert w_pair.shape == (8,)


def test_causal_requires_mean_sq():
    exp = override(get_preset("abgrall_admm"), {
        "loss.causal_eps": 1.0,
        "train.epochs": 10,
        "train.chunk": 10,
        "sampling.n_f": 64,
    })
    tr = Trainer(exp)
    with pytest.raises(ValueError, match="causal"):
        tr.train()


def test_causal_training_smoke():
    exp = override(get_preset("abgrall_admm"), {
        "model.layers": (2, 16, 16, 1),
        "loss.residual_kind": "mean_sq",
        "loss.causal_eps": 1.0,
        "loss.causal_bins": 8,
        "optimizer.kind": "adam",
        "train.epochs": 200,
        "train.chunk": 100,
        "sampling.n_f": 256,
    })
    _, summary = Trainer(exp).train()
    assert np.isfinite(summary["rel_l2_u"])


def test_relative_weights_scale_invariant():
    """relative=True makes the causal weights invariant under a uniform
    residual rescale — the persistence property: selection pressure does
    not fade as the solve converges."""
    import jax.numpy as jnp

    f = jnp.linspace(0.1, 1.0, 64).reshape(-1, 1)
    t = jnp.linspace(0.0, 1.0, 64)
    _, w1 = causal_residual_penalty(f, t, 0.0, 1.0, eps=0.2, bins=8,
                                    relative=True)
    _, w2 = causal_residual_penalty(1e-3 * f, t, 0.0, 1.0, eps=0.2, bins=8,
                                    relative=True)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2), rtol=1e-5)
    # absolute weights DO fade to 1 under the same rescale
    _, a1 = causal_residual_penalty(f, t, 0.0, 1.0, eps=5.0, bins=8)
    _, a2 = causal_residual_penalty(1e-3 * f, t, 0.0, 1.0, eps=5.0, bins=8)
    assert float(a2.min()) > float(a1.min())
    assert float(a2.min()) > 0.99  # faded


def test_causal_relative_training_smoke():
    exp = override(get_preset("twosin_weak"), {
        "model.layers": (2, 16, 16, 1),
        "loss.causal_eps": 0.2,
        "loss.causal_relative": True,
        "train.epochs": 200,
        "train.chunk": 100,
        "sampling.n_f": 256,
    })
    _, summary = Trainer(exp).train()
    assert np.isfinite(summary["rel_l2_u"])
