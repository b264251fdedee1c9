"""Tensor-parallel parameter sharding: same math, weights split over devices."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinns_tpu.models.mlp import MLPSpec, init_mlp, mlp_apply
from pinns_tpu.parallel.mesh import make_mesh
from pinns_tpu.parallel.sharding import place_params_tp, tp_param_shardings

HAVE_REF = os.path.isdir("/root/reference")


def test_tp_forward_matches_replicated():
    mesh = make_mesh(data=1, ensemble=8)  # 8-way model split on 'ensemble'
    spec = MLPSpec(layers=(2, 64, 64, 64, 1), lb=(-1.0, 0.0), ub=(1.0, 1.0))
    params = {"net": init_mlp(jax.random.key(0), spec),
              "coeffs": {"lambda1": jnp.ones((1,)), "lambda2": jnp.zeros((1,))}}
    x = jax.random.uniform(jax.random.key(1), (256, 2))

    ref = mlp_apply(spec, params["net"], x)
    tp_params = place_params_tp(params, mesh)
    # hidden weights actually sharded over all 8 devices
    assert len(tp_params["net"][0]["W"].sharding.device_set) == 8
    out = jax.jit(lambda p, z: mlp_apply(spec, p["net"], z))(tp_params, x)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), rtol=2e-5, atol=1e-6)


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_tp_training_step_runs():
    from pinns_tpu.config import override
    from pinns_tpu.experiments import get_preset
    from pinns_tpu.train import Trainer

    exp = override(
        get_preset("abgrall_l2"),
        {"model.layers": (2, 64, 64, 1), "sampling.n_f": 256, "train.chunk": 5},
    )
    tr = Trainer(exp)
    mesh = make_mesh(data=1, ensemble=8)
    state = tr.init_state()
    state = state._replace(params=place_params_tp(state.params, mesh))
    run = tr._get_chunk("adam", 5)
    state, metrics = run(state)
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))


def test_tp_sharding_structure():
    mesh = make_mesh(data=2, ensemble=4)
    spec = MLPSpec(layers=(2, 32, 32, 1), lb=(0.0, 0.0), ub=(1.0, 1.0))
    params = {"net": init_mlp(jax.random.key(2), spec),
              "coeffs": {"lambda1": jnp.ones((1,)), "lambda2": jnp.zeros((1,))}}
    sh = tp_param_shardings(params, mesh)
    # hidden: column-sharded; head: row-sharded (contraction dim)
    assert sh["net"][0]["W"].spec == jax.sharding.PartitionSpec(None, "ensemble")
    assert sh["net"][-1]["W"].spec == jax.sharding.PartitionSpec("ensemble", None)
