"""Microbatched (rematerialized) residual accumulation == monolithic."""

import os

import jax
import numpy as np
import pytest

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer
from pinns_tpu.train.trainer import make_loss_fn

HAVE_REF = os.path.isdir("/root/reference")
pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")


def _pair(preset, **extra):
    base = {
        "model.layers": (2, 16, 16, 1),
        "sampling.n_f": 512,
        "train.epochs": 40,
        "train.chunk": 20,
    }
    base.update(extra)
    mono = override(get_preset(preset), base)
    micro = override(mono, {"sampling.microbatch": 8})
    return mono, micro


@pytest.mark.parametrize(
    "preset", ["abgrall_l2", "abgrall_l1", "abgrall_admm", "burgers_forward"]
)
def test_microbatched_loss_matches(preset):
    mono_exp, micro_exp = _pair(preset)
    if preset == "burgers_forward":
        # anchored strategy appends N_u points; keep count divisible by 8
        extra = {"optimizer.kind": "adam", "sampling.strategy": "fixed_lhs"}
        mono_exp = override(mono_exp, extra)
        micro_exp = override(micro_exp, extra)
    tr_mono = Trainer(mono_exp)
    tr_micro = Trainer(micro_exp)
    state = tr_mono.init_state()

    loss_mono = make_loss_fn(tr_mono.problem)
    loss_micro = make_loss_fn(tr_micro.problem)
    l1, _ = loss_mono(state.params, state.colloc, state.admm)
    l2, _ = loss_micro(state.params, state.colloc, state.admm)
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)

    g1 = jax.grad(lambda p: loss_mono(p, state.colloc, state.admm)[0])(state.params)
    g2 = jax.grad(lambda p: loss_micro(p, state.colloc, state.admm)[0])(state.params)
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-4, atol=1e-6)


def test_microbatched_training_trajectory_matches():
    mono_exp, micro_exp = _pair("abgrall_admm")
    tr_mono = Trainer(mono_exp)
    tr_micro = Trainer(micro_exp)
    s_mono, m_mono = tr_mono._get_chunk("adam", 20)(tr_mono.init_state())
    s_micro, m_micro = tr_micro._get_chunk("adam", 20)(tr_micro.init_state())
    np.testing.assert_allclose(
        np.asarray(m_mono["loss"]),
        np.asarray(m_micro["loss"]),
        rtol=5e-4,
        atol=1e-6,
    )


@pytest.mark.parametrize("remat", ["none", "dots"])
@pytest.mark.parametrize("preset", ["abgrall_admm", "burgers_forward"])
def test_remat_policy_identical_math(preset, remat):
    """microbatch_remat changes only what the backward pass recomputes vs
    reloads — loss AND grads must match the default 'full' policy exactly
    (same float ops, same order)."""
    extra = {}
    if preset == "burgers_forward":
        extra = {"optimizer.kind": "adam", "sampling.strategy": "fixed_lhs"}
    _, micro_exp = _pair(preset, **extra)
    var_exp = override(
        micro_exp,
        {"sampling.microbatch_remat": remat, "sampling.microbatch_unroll": 2},
    )
    tr_full = Trainer(micro_exp)
    tr_var = Trainer(var_exp)
    state = tr_full.init_state()

    loss_full = make_loss_fn(tr_full.problem)
    loss_var = make_loss_fn(tr_var.problem)
    l1, _ = loss_full(state.params, state.colloc, state.admm)
    l2, _ = loss_var(state.params, state.colloc, state.admm)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)

    g1 = jax.grad(lambda p: loss_full(p, state.colloc, state.admm)[0])(state.params)
    g2 = jax.grad(lambda p: loss_var(p, state.colloc, state.admm)[0])(state.params)
    f1, _ = jax.flatten_util.ravel_pytree(g1)
    f2, _ = jax.flatten_util.ravel_pytree(g2)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), rtol=1e-5, atol=1e-7)


def test_remat_policy_unknown_rejected():
    _, micro_exp = _pair("abgrall_admm")
    bad = override(micro_exp, {"sampling.microbatch_remat": "sometimes"})
    tr = Trainer(bad)
    state = tr.init_state()
    with pytest.raises(ValueError, match="microbatch_remat"):
        make_loss_fn(tr.problem)(state.params, state.colloc, state.admm)


def test_euler_microbatched_loss_matches():
    mono = override(
        get_preset("euler_admm"),
        {
            "model.layers": (2, 16, 16, 3),
            "sampling.n_f": 256,
        },
    )
    micro = override(mono, {"sampling.microbatch": 4})
    tr1, tr2 = Trainer(mono), Trainer(micro)
    state = tr1.init_state()
    l1, _ = make_loss_fn(tr1.problem)(state.params, state.colloc, state.admm)
    l2, _ = make_loss_fn(tr2.problem)(state.params, state.colloc, state.admm)
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-5)
