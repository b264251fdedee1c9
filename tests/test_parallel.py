"""Sharded and ensemble execution on the 8-virtual-device CPU mesh."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.parallel.ensemble import (
    evaluate_ensemble,
    init_ensemble_states,
    make_ensemble_chunk,
)
from pinns_tpu.parallel.mesh import DATA_AXIS, make_mesh
from pinns_tpu.parallel.sharding import (
    place_ensemble,
    place_state,
    shard_trainer,
)
from pinns_tpu.train import Trainer

HAVE_REF = os.path.isdir("/root/reference")
pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")


def _exp(**updates):
    base = {
        "model.layers": (2, 16, 16, 1),
        "train.epochs": 100,
        "train.chunk": 50,
        "sampling.n_f": 512,
    }
    base.update(updates)
    return override(get_preset("abgrall_admm"), base)


def test_mesh_axes():
    assert len(jax.devices()) == 8, "conftest should give 8 virtual devices"
    mesh = make_mesh()
    assert mesh.shape == {"ensemble": 1, "data": 8}
    mesh2 = make_mesh(data=4, ensemble=2)
    assert mesh2.shape == {"ensemble": 2, "data": 4}
    with pytest.raises(ValueError):
        make_mesh(data=16)


def test_sharded_step_matches_unsharded():
    """The partitioned program computes the same training trajectory."""
    tr = Trainer(_exp())
    state0 = tr.init_state()
    run = tr._get_chunk("adam", 50)
    ref_state, ref_metrics = run(state0)

    mesh = make_mesh()  # all 8 devices on 'data'
    shard_trainer(tr, mesh)
    sharded0 = place_state(tr.init_state(), mesh)
    run_sharded = tr._get_chunk("adam", 50)
    out_state, out_metrics = run_sharded(sharded0)

    np.testing.assert_allclose(
        np.asarray(ref_metrics["loss"]),
        np.asarray(out_metrics["loss"]),
        rtol=2e-4,
        atol=1e-6,
    )
    w_ref = np.asarray(ref_state.params["net"][0]["W"])
    w_out = np.asarray(out_state.params["net"][0]["W"])
    np.testing.assert_allclose(w_ref, w_out, rtol=5e-4, atol=1e-5)
    # collocation batch is actually sharded across devices
    assert len(out_state.colloc.sharding.device_set) == 8


def test_shard_trainer_validates_divisibility():
    tr = Trainer(_exp(**{"sampling.n_f": 100}))
    with pytest.raises(ValueError):
        shard_trainer(tr, make_mesh())


def test_ensemble_training_matches_individual():
    tr = Trainer(_exp(**{"sampling.n_f": 256}))
    seeds = [0, 1, 2, 3]
    stacked = init_ensemble_states(tr, seeds)
    run = make_ensemble_chunk(tr, 20)
    stacked, metrics = run(stacked)
    assert np.asarray(metrics["loss"]).shape == (20, 4)

    # member 0 of the ensemble == a solo run with the same seed
    solo = tr.init_state(seed=0)
    solo_run = tr._get_chunk("adam", 20)
    solo, solo_metrics = solo_run(solo)
    np.testing.assert_allclose(
        np.asarray(metrics["loss"])[:, 0],
        np.asarray(solo_metrics["loss"]),
        rtol=2e-4,
        atol=1e-6,
    )

    summaries = evaluate_ensemble(tr, stacked, 4)
    assert len(summaries) == 4
    assert all(np.isfinite(s["rel_l2_u"]) for s in summaries)


def test_ensemble_sharded_over_mesh():
    tr = Trainer(_exp(**{"sampling.n_f": 256}))
    mesh = make_mesh(data=2, ensemble=4)
    stacked = place_ensemble(init_ensemble_states(tr, [0, 1, 2, 3]), mesh)
    run = make_ensemble_chunk(tr, 10)
    stacked, metrics = run(stacked)
    assert np.all(np.isfinite(np.asarray(metrics["loss"])))
    assert len(stacked.colloc.sharding.device_set) == 8


def test_ensemble_rho_sweep_matches_solo():
    """Per-member rho (the reference's sweep axis) inside one vmapped program."""
    tr = Trainer(_exp(**{"sampling.n_f": 256}))
    stacked = init_ensemble_states(tr, seeds=[0, 0, 0], rhos=[1.0, 10.0, 40.0])
    run = make_ensemble_chunk(tr, 15)
    stacked, metrics = run(stacked)
    losses = np.asarray(metrics["loss"])  # (15, 3)
    # different rho -> genuinely different trajectories
    assert not np.allclose(losses[:, 0], losses[:, 2])

    # member with rho=10 == solo run with the preset's static rho=10
    solo = tr.init_state(seed=0)
    solo, solo_metrics = tr._get_chunk("adam", 15)(solo)
    np.testing.assert_allclose(
        losses[:, 1], np.asarray(solo_metrics["loss"]), rtol=2e-4, atol=1e-6
    )
