import os

import jax.numpy as jnp
import numpy as np
import pytest

from pinns_tpu.config import override
from pinns_tpu.experiments import PRESETS, get_preset
from pinns_tpu.train import Trainer

HAVE_REF = os.path.isdir("/root/reference")
pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")


def _small(preset, **updates):
    exp = get_preset(preset)
    base = {
        "train.epochs": 300,
        "train.chunk": 100,
        "sampling.n_f": 256,
    }
    base.update(updates)
    return override(exp, base)


def test_preset_registry():
    assert len(PRESETS) >= 11
    with pytest.raises(KeyError):
        get_preset("nope")


def test_burgers_l2_short_training_decreases_loss():
    tr = Trainer(_small("abgrall_l2", **{"model.layers": (2, 16, 16, 1)}))
    state = tr.init_state()
    state, summary = tr.train(state)
    assert summary["epochs"] == 300
    assert np.isfinite(summary["rel_l2_u"])
    assert summary["rel_l2_u"] < 1.5  # sane, finite output


def test_burgers_admm_short_training():
    tr = Trainer(_small("abgrall_admm", **{"model.layers": (2, 16, 16, 1)}))
    state = tr.init_state()
    assert state.admm is not None
    state, summary = tr.train(state)
    # ADMM state advanced and stayed finite
    assert np.all(np.isfinite(np.asarray(state.admm.z)))
    assert summary["rel_l2_u"] < 1.5


def test_euler_admm_short_training():
    exp = _small("euler_admm", **{"model.layers": (2, 24, 24, 3)})
    tr = Trainer(exp)
    state = tr.init_state()
    assert isinstance(state.admm.z, tuple) and len(state.admm.z) == 3
    state, summary = tr.train(state)
    for f in ("rho", "u", "E"):
        assert np.isfinite(summary[f"rel_l2_{f}"])


def test_euler_admm_tuned_preset_short_training():
    """The round-2 study's winning recipe (field weights + curriculum)
    trains end-to-end as shipped."""
    exp = _small(
        "euler_admm_tuned",
        **{
            "model.layers": (2, 24, 24, 3),
            "sampling.t_curriculum_epochs": 200,
        },
    )
    assert exp.loss.data_field_weights == (3.0, 1.0, 1.0)
    tr = Trainer(exp)
    state, summary = tr.train(tr.init_state())
    for f in ("rho", "u", "E"):
        assert np.isfinite(summary[f"rel_l2_{f}"])


def test_swa_tail_average_reported(tmp_path):
    """TrainConfig.swa_frac > 0 accumulates the chunk-boundary tail average
    and reports swa_rel_l2_* alongside the final-iterate metrics."""
    import jax

    exp = _small(
        "abgrall_l2",
        **{
            "model.layers": (2, 16, 16, 1),
            "train.swa_frac": 0.5,
            "train.out_dir": str(tmp_path),
        },
    )
    tr = Trainer(exp)
    state, summary = tr.train(tr.init_state())
    # the averaged iterate is saved as a loadable checkpoint
    swa_ckpt = tmp_path / f"{exp.name}_swa.ckpt"
    assert swa_ckpt.exists()
    restored = tr.load_checkpoint(str(swa_ckpt))
    a0 = jax.tree_util.tree_leaves(tr.swa_params)[0]
    r0 = jax.tree_util.tree_leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a0), np.asarray(r0))
    # epochs=300, chunk=100, window=(150, 300] -> snapshots at 200 and 300
    assert summary["swa_snapshots"] == 2
    assert np.isfinite(summary["swa_rel_l2_u"])
    assert tr.swa_params is not None
    # same structure and working dtype as the live params
    jax.tree_util.tree_map(
        lambda a, p: (a.shape == p.shape, a.dtype == p.dtype),
        tr.swa_params,
        state.params,
    )
    flat_a = jax.tree_util.tree_leaves(tr.swa_params)
    flat_p = jax.tree_util.tree_leaves(state.params)
    assert all(a.dtype == p.dtype for a, p in zip(flat_a, flat_p))
    # swa_frac=0 leaves the summary untouched
    tr0 = Trainer(_small("abgrall_l2", **{"model.layers": (2, 16, 16, 1)}))
    _, s0 = tr0.train(tr0.init_state())
    assert "swa_snapshots" not in s0 and tr0.swa_params is None


def test_hybrid_switch_runs_lbfgs_phase():
    exp = _small(
        "abgrall_admm",
        **{
            "model.layers": (2, 12, 12, 1),
            "train.epochs": 12,
            "train.chunk": 10,
            "optimizer.switch_epoch": 10,
            "optimizer.lbfgs.max_iters": 20,
        },
    )
    tr = Trainer(exp)
    state, summary = tr.train()
    assert int(state.epoch) == 12
    assert summary["epochs"] == 12


def test_loss_decreases_over_training():
    exp = _small(
        "burgers_forward",
        **{
            "model.layers": (2, 20, 20, 20, 1),
            "train.epochs": 1500,
            "train.chunk": 500,
            "optimizer.kind": "adam",
            "sampling.n_f": 1024,
            "sampling.strategy": "resample_uniform",
        },
    )
    tr = Trainer(exp)
    state = tr.init_state()
    first = None
    last = None
    for _ in range(3):
        run = tr._get_chunk("adam", 500)
        state, metrics = run(state)
        if first is None:
            first = float(np.asarray(metrics["loss"])[0])
        last = float(np.asarray(metrics["loss"])[-1])
    assert last < first * 0.5


def test_checkpoint_roundtrip(tmp_path):
    exp = _small(
        "abgrall_admm",
        **{
            "model.layers": (2, 12, 12, 1),
            "train.epochs": 50,
            "train.chunk": 25,
            "train.out_dir": str(tmp_path),
        },
    )
    tr = Trainer(exp)
    state, _ = tr.train()
    path = tr.save_checkpoint(state, tag="test")
    restored = tr.load_checkpoint(path)
    assert int(restored.epoch) == int(state.epoch)
    np.testing.assert_array_equal(
        np.asarray(restored.params["net"][0]["W"]),
        np.asarray(state.params["net"][0]["W"]),
    )
    np.testing.assert_array_equal(
        np.asarray(restored.admm.z), np.asarray(state.admm.z)
    )
    # resume continues from the restored epoch
    state2, summary = tr.train(restored, epochs=60)
    assert summary["epochs"] == 60


def test_snapshot_stream(tmp_path):
    exp = _small(
        "abgrall_l2",
        **{
            "model.layers": (2, 8, 8, 1),
            "train.epochs": 20,
            "train.chunk": 10,
            "train.out_dir": str(tmp_path),
            "train.snapshot_every": 10,
        },
    )
    tr = Trainer(exp)
    tr.train()
    snap = tmp_path / "abgrall_l2_snapshots.csv"
    assert snap.exists()
    import csv

    with open(snap) as fh:
        rows = list(csv.reader(fh))
    assert rows[0] == ["x", "t", "u_pred", "epoch"]
    n_grid = tr.problem.dataset.n_points
    assert len(rows) == 1 + 2 * n_grid  # two snapshot epochs


def test_inverse_coeffs_are_trainable():
    exp = _small(
        "burgers_inverse",
        **{
            "model.layers": (2, 16, 16, 1),
            "train.epochs": 200,
            "train.chunk": 100,
            "optimizer.kind": "adam",
            "sampling.n_f": 512,
            "data.n_u": 200,
        },
    )
    tr = Trainer(exp)
    state = tr.init_state()
    lam1_0 = float(state.params["coeffs"]["lambda1"][0])
    state, summary = tr.train(state)
    lam1_1 = float(state.params["coeffs"]["lambda1"][0])
    assert lam1_0 != lam1_1  # coefficients moved
    # exp transform keeps lambda2 positive
    assert summary["lambda2"] > 0


def test_euler_inverse_identifies_dissipation():
    """euler_inverse (PARITY §4l): the weak-form dissipation-identification
    preset trains at toy scale, moves lambda2, keeps it positive via the
    exp transform, and fits the interior data."""
    exp = _small(
        "euler_inverse",
        **{
            "model.layers": (2, 16, 16, 3),
            "train.epochs": 200,
            "train.chunk": 100,
            "sampling.n_f": 256,
            "data.n_u": 200,
        },
    )
    tr = Trainer(exp)
    state = tr.init_state()
    lam2_0 = float(state.params["coeffs"]["lambda2"][0])
    state, summary = tr.train(state)
    lam2_1 = float(state.params["coeffs"]["lambda2"][0])
    assert lam2_0 != lam2_1  # dissipation coefficient moved
    assert summary["lambda2"] > 0  # exp transform keeps nu positive
    for k in ("rel_l2_rho", "rel_l2_u", "rel_l2_E"):
        assert np.isfinite(summary[k])


def test_frozen_coeffs_stay_fixed():
    exp = _small("abgrall_admm", **{"model.layers": (2, 8, 8, 1), "train.epochs": 50, "train.chunk": 50})
    tr = Trainer(exp)
    state, summary = tr.train()
    assert summary["lambda1"] == 1.0
    assert summary["lambda2"] == 0.0


def test_admm_current_points_variant():
    """'current' update-point semantics trains and differs from 'resampled'."""
    base = _small("abgrall_admm", **{"model.layers": (2, 12, 12, 1),
                                     "train.epochs": 60, "train.chunk": 30,
                                     "optimizer.kind": "adam"})
    cur = override(base, {"loss.admm_update_points": "current"})
    s1, r1 = Trainer(base).train()
    s2, r2 = Trainer(cur).train()
    assert np.isfinite(r2["rel_l2_u"])
    # different semantics -> different trajectories
    w1 = np.asarray(s1.params["net"][0]["W"])
    w2 = np.asarray(s2.params["net"][0]["W"])
    assert not np.allclose(w1, w2)


def test_lr_schedules_run_and_differ():
    base = _small("abgrall_l2", **{"model.layers": (2, 12, 12, 1),
                                   "train.epochs": 100, "train.chunk": 50,
                                   "sampling.n_f": 128})
    runs = {}
    for sched in ("constant", "cosine", "exponential"):
        exp = override(base, {"optimizer.lr_schedule": sched,
                              "optimizer.schedule_epochs": 100})
        _, summary = Trainer(exp).train()
        runs[sched] = summary["rel_l2_u"]
        assert np.isfinite(summary["rel_l2_u"])
    assert runs["constant"] != runs["cosine"]


def test_make_chunked_rejects_changing_metric_keys():
    """A retrace that returns a different metric set must fail loudly, not
    silently mislabel the packed metrics."""
    from pinns_tpu.train.trainer import make_chunked

    traces = []

    def step(state):
        traces.append(None)
        key = "a" if len(traces) == 1 else "b"
        return state + 1, {key: jnp.sum(state)}

    run = make_chunked(step, 2)
    run(jnp.zeros((4,)))  # first trace: keys == ['a']
    with pytest.raises(RuntimeError, match="metric keys changed"):
        run(jnp.zeros((8,)))  # new shape -> retrace -> keys == ['b']


def test_checkpoint_roundtrip_with_rho_override(tmp_path):
    """A state carrying a per-run rho override restores correctly — the
    template must match the checkpoint's pytree structure."""
    exp = _small("abgrall_admm", **{
        "model.layers": (2, 8, 8, 1),
        "train.epochs": 10,
        "train.chunk": 5,
        "train.out_dir": str(tmp_path),
    })
    tr = Trainer(exp)
    state = tr.init_state(rho=25.0)
    state, _ = tr._get_chunk("adam", 5)(state)
    path = tr.save_checkpoint(state, tag="rho_test")
    restored = tr.load_checkpoint(path)
    assert restored.rho is not None
    assert float(np.asarray(restored.rho)) == 25.0
    np.testing.assert_array_equal(
        np.asarray(restored.params["net"][0]["W"]),
        np.asarray(state.params["net"][0]["W"]),
    )


def test_mixed_precision_training_runs_and_learns():
    """compute_dtype='bfloat16' trains with f32 master weights; loss
    decreases and the state stays f32 end to end."""
    exp = _small("burgers_forward", **{
        "model.layers": (2, 16, 16, 16, 1),
        "model.compute_dtype": "bfloat16",
        "train.epochs": 400,
        "train.chunk": 200,
        "sampling.n_f": 512,
    })
    tr = Trainer(exp)
    assert tr.problem.spec.mixed
    state = tr.init_state()
    run = tr._get_chunk("adam", 200)
    state, m1 = run(state)
    state, m2 = run(state)
    l0 = float(np.asarray(m1["loss"][0]))
    l1 = float(np.asarray(m2["loss"][-1]))
    assert np.isfinite(l1) and l1 < 0.5 * l0
    assert state.params["net"][0]["W"].dtype == jnp.float32


def test_loss_weights_and_field_weights():
    """data_weight / residual_weight / per-field weights reshape the loss;
    residual_weight is rejected with ADMM (rho owns that scale)."""
    from pinns_tpu.train.trainer import make_loss_fn

    exp = _small("abgrall_l2", **{
        "model.layers": (2, 8, 8, 1),
        "sampling.n_f": 64,
        "loss.data_weight": 10.0,
        "loss.residual_weight": 0.5,
    })
    tr = Trainer(exp)
    state = tr.init_state()
    loss_fn = make_loss_fn(tr.problem)
    loss, aux = loss_fn(state.params, state.colloc, state.admm)
    # res_term is logged as the WEIGHTED loss contribution (consistent with
    # the L-BFGS-phase metric), so the decomposition is additive:
    np.testing.assert_allclose(
        float(loss),
        10.0 * float(aux["data_term"]) + float(aux["res_term"]),
        rtol=1e-6,
    )

    with pytest.raises(ValueError, match="rho"):
        bad = _small("abgrall_admm", **{"loss.residual_weight": 2.0})
        make_loss_fn(Trainer(bad).problem)

    # Euler per-field weights change the data term
    e1 = _small("euler_admm", **{"sampling.n_f": 64, "train.epochs": 2})
    e2 = _small("euler_admm", **{
        "sampling.n_f": 64, "train.epochs": 2,
        "loss.data_field_weights": (5.0, 1.0, 1.0),
    })
    t1, t2 = Trainer(e1), Trainer(e2)
    s1 = t1.init_state()
    l1 = make_loss_fn(t1.problem)(s1.params, s1.colloc, s1.admm)[1]
    l2 = make_loss_fn(t2.problem)(s1.params, s1.colloc, s1.admm)[1]
    assert float(l2["data_term"]) > float(l1["data_term"])

    with pytest.raises(ValueError, match="entries"):
        bad = _small("euler_admm", **{"loss.data_field_weights": (1.0, 2.0)})
        make_loss_fn(Trainer(bad).problem)


def test_time_curriculum_grows_sampled_range():
    """With t_curriculum_epochs set, early batches sample a shrunken t-range
    that grows to the full domain."""
    exp = _small("abgrall_admm", **{
        "model.layers": (2, 8, 8, 1),
        "sampling.n_f": 512,
        "sampling.t_curriculum_epochs": 100,
        "train.epochs": 10,
        "train.chunk": 5,
    })
    tr = Trainer(exp)
    state = tr.init_state()
    t_hi = float(tr.problem.ub[1])
    t_lo = float(tr.problem.lb[1])
    # initial batch: ~5% of the t-range (the curriculum floor)
    t0_max = float(np.asarray(state.colloc[:, 1]).max())
    assert t0_max < t_lo + 0.12 * (t_hi - t_lo)
    run = tr._get_chunk("adam", 5)
    state, _ = run(state)
    assert np.isfinite(float(np.asarray(state.colloc).max()))
    # after many epochs the range opens up
    state = state._replace(epoch=jnp.asarray(99, jnp.int32))
    state, _ = run(state)
    t_late_max = float(np.asarray(state.colloc[:, 1]).max())
    assert t_late_max > t_lo + 0.9 * (t_hi - t_lo)


def test_scan_unroll_matches_unrolled_trajectory():
    """unroll>1 is a pure XLA scheduling change: the chunk must produce the
    same trajectory (to float tolerance) and identical metrics layout."""
    import jax

    def run_with(unroll):
        exp = _small("abgrall_admm", **{
            "model.layers": (2, 8, 8, 1),
            "sampling.n_f": 128,
            "train.epochs": 24,
            "train.chunk": 12,
            "train.scan_unroll": unroll,
        })
        tr = Trainer(exp)
        state = tr.init_state()
        run = tr._get_chunk("adam", 12)
        state, metrics = run(state)
        state, metrics = run(state)
        return state, metrics

    s1, m1 = run_with(1)
    s4, m4 = run_with(4)
    assert set(m1) == set(m4)
    assert m1["loss"].shape == m4["loss"].shape
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s4.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_resolve_scan_unroll_policy():
    """Auto (0): unroll 8 only for narrow nets, Adam phase, chunks >= 200;
    explicit values pass through clamped to the chunk length."""
    from pinns_tpu.train.trainer import resolve_scan_unroll

    narrow = _small("abgrall_admm", **{"model.layers": (2, 20, 20, 1)})
    wide = _small("abgrall_admm", **{"model.layers": (2, 200, 200, 1)})
    assert resolve_scan_unroll(narrow, "adam", 1000) == 8
    assert resolve_scan_unroll(narrow, "adam", 100) == 1   # short chunk
    assert resolve_scan_unroll(narrow, "lbfgs", 1000) == 1  # lbfgs phase
    # wide trunk at small batch (Euler-like): still issue-bound -> 4
    assert resolve_scan_unroll(wide, "adam", 1000) == 4
    big_batch = _small(
        "abgrall_admm",
        **{"model.layers": (2, 200, 200, 1), "sampling.n_f": 1 << 20},
    )
    assert resolve_scan_unroll(big_batch, "adam", 1000) == 1  # compute-bound
    explicit = _small("abgrall_admm", **{"train.scan_unroll": 16})
    assert resolve_scan_unroll(explicit, "adam", 1000) == 16
    assert resolve_scan_unroll(explicit, "adam", 4) == 4    # clamp to chunk


def test_data_field_weights_rejected_for_burgers():
    from pinns_tpu.train.trainer import make_loss_fn

    exp = _small("abgrall_l2", **{"loss.data_field_weights": (2.0,)})
    with pytest.raises(ValueError, match="Euler"):
        make_loss_fn(Trainer(exp).problem)


def test_res_term_metric_decomposition_is_additive():
    """aux must satisfy loss == data_weight*data_term + res_term in the
    Adam phase (matching the L-BFGS phase's reconstruction)."""
    from pinns_tpu.train.trainer import make_loss_fn

    exp = _small(
        "abgrall_l2",
        **{"loss.residual_weight": 0.5, "loss.data_weight": 2.0},
    )
    tr = Trainer(exp)
    state = tr.init_state()
    loss, aux = make_loss_fn(tr.problem)(state.params, state.colloc, None)
    np.testing.assert_allclose(
        float(loss),
        2.0 * float(aux["data_term"]) + float(aux["res_term"]),
        rtol=1e-6,
    )


def test_rad_initial_batch_honors_curriculum():
    exp = _small("abgrall_admm", **{
        "sampling.strategy": "rad",
        "sampling.t_curriculum_epochs": 1000,
        "sampling.n_f": 512,
    })
    tr = Trainer(exp)
    state = tr.init_state()
    t_lo = float(tr.problem.lb[1])
    t_hi = float(tr.problem.ub[1])
    t0_max = float(np.asarray(state.colloc[:, 1]).max())
    assert t0_max < t_lo + 0.12 * (t_hi - t_lo)


def test_ensemble_stop_tol_stops_early():
    from pinns_tpu.parallel.ensemble import run_ensemble

    exp = _small("abgrall_l2", **{
        "model.layers": (2, 8, 8, 1),
        "sampling.n_f": 128,
        "optimizer.kind": "adam",
        "train.stop_tol": 1e6,  # trivially satisfied after one chunk
        "train.chunk": 10,
        "train.epochs": 1000,
    })
    tr = Trainer(exp)
    _, summaries = run_ensemble(tr, seeds=[0, 1])
    assert all(s["epochs"] < 1000 for s in summaries)
