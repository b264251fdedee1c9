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


def test_ensemble_resume_from_member_checkpoints(tmp_path):
    """A crashed ensemble resumes exactly: stacking the per-member
    checkpoints written mid-run and continuing reproduces the
    uninterrupted run's final parameters."""
    from pinns_tpu.parallel.ensemble import run_ensemble, stack_states

    def make_trainer():
        return Trainer(_exp(**{
            "sampling.n_f": 256,
            "train.epochs": 100,
            "train.chunk": 50,
            "train.checkpoint_every": 50,
            "train.out_dir": str(tmp_path),
            "train.log_every": 0,
        }))

    tr = make_trainer()
    full, _ = run_ensemble(tr, [0, 1])

    # fresh trainer (fresh logger), resume from the epoch-50 checkpoints
    tr2 = make_trainer()
    members = [
        tr2.load_checkpoint(str(tmp_path / f"abgrall_admm_e50_m{i}.ckpt"))
        for i in range(2)
    ]
    stacked0 = stack_states(members)
    assert int(np.asarray(stacked0.epoch).flat[0]) == 50
    resumed, _ = run_ensemble(tr2, [0, 1], stacked=stacked0)

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
        ),
        full.params,
        resumed.params,
    )


@pytest.mark.parametrize("preset", ["abgrall_admm", "twosin_weak"])
def test_selection_scores_rank_without_ground_truth(preset):
    """The ground-truth-free selector (data misfit + fresh-batch residual)
    must rank an intact trained member above a noise-sabotaged copy, in
    agreement with the oracle rel-L2 — on both the strong-form ADMM recipe
    and the weak-form flux recipe (training_residuals dispatches on the
    trained objective)."""
    from pinns_tpu.parallel.ensemble import select_member, selection_scores

    tr = Trainer(
        override(
            get_preset(preset),
            {
                "model.layers": (2, 16, 16, 1),
                "train.epochs": 100,
                "train.chunk": 50,
                "sampling.n_f": 256,
            },
        )
    )
    stacked = init_ensemble_states(tr, [0, 1])
    stacked, _ = make_ensemble_chunk(tr, 60)(stacked)

    # sabotage member 1 with heavy parameter noise -> strictly worse model
    def perturb(leaf):
        key = jax.random.PRNGKey(leaf.size % 101)
        return leaf + 0.5 * jax.random.normal(key, leaf.shape, leaf.dtype)

    member1 = jax.tree_util.tree_map(lambda x: perturb(x[1]), stacked.params)
    params = jax.tree_util.tree_map(
        lambda s, m: s.at[1].set(m), stacked.params, member1
    )
    stacked = stacked._replace(params=params)

    scores = selection_scores(tr, stacked, 2, n_points=512)
    assert select_member(scores) == 0
    assert scores[0]["resid_ms"] < scores[1]["resid_ms"]
    assert scores[0]["data_term"] < scores[1]["data_term"]

    oracle = evaluate_ensemble(tr, stacked, 2)
    assert oracle[0]["rel_l2_u"] < oracle[1]["rel_l2_u"]


def test_selection_consensus_distance_to_anchor_mean():
    """The consensus selector (PARITY §4r flank: residual score saturates
    inside the low-residual cluster) ranks members by field distance to the
    anchor ensemble's mean prediction: an intact member must beat a
    sabotaged copy, and without anchor_params the key is absent."""
    from pinns_tpu.parallel.ensemble import select_member, selection_scores

    tr = Trainer(
        override(
            get_preset("twosin_weak"),
            {
                "model.layers": (2, 16, 16, 1),
                "train.epochs": 100,
                "train.chunk": 50,
                "sampling.n_f": 256,
            },
        )
    )
    stacked = init_ensemble_states(tr, [0, 1])
    stacked, _ = make_ensemble_chunk(tr, 60)(stacked)
    anchor_params = stacked.params  # the pre-tail "Adam" ensemble

    assert "consensus" not in selection_scores(tr, stacked, 2, n_points=256)[0]

    def perturb(leaf):
        key = jax.random.PRNGKey(leaf.size % 101)
        return leaf + 0.5 * jax.random.normal(key, leaf.shape, leaf.dtype)

    member1 = jax.tree_util.tree_map(lambda x: perturb(x[1]), stacked.params)
    params = jax.tree_util.tree_map(
        lambda s, m: s.at[1].set(m), stacked.params, member1
    )
    tailed = stacked._replace(params=params)

    scores = selection_scores(
        tr, tailed, 2, n_points=256, anchor_params=anchor_params
    )
    assert scores[0]["consensus"] < scores[1]["consensus"]
    assert select_member(scores, by="consensus") == 0


@pytest.mark.parametrize("preset", ["abgrall_admm", "twosin_weak"])
def test_selection_scores_coarse_battery(preset):
    """coarse_scales adds the multi-scale conservation-defect diagnostics
    (coarse_r{s} / coarse_ent{s}) for ANY trained residual kind — the
    strong-form ADMM recipe included (weak cells need only the net + PDE
    coefficients) — and an intact member must beat a noise-sabotaged copy
    on the coarse defect at every scale; select_member works with the new
    keys generically."""
    from pinns_tpu.parallel.ensemble import select_member, selection_scores

    tr = Trainer(
        override(
            get_preset(preset),
            {
                "model.layers": (2, 16, 16, 1),
                "train.epochs": 100,
                "train.chunk": 50,
                "sampling.n_f": 256,
            },
        )
    )
    stacked = init_ensemble_states(tr, [0, 1])
    stacked, _ = make_ensemble_chunk(tr, 60)(stacked)

    def perturb(leaf):
        key = jax.random.PRNGKey(leaf.size % 101)
        return leaf + 0.5 * jax.random.normal(key, leaf.shape, leaf.dtype)

    member1 = jax.tree_util.tree_map(lambda x: perturb(x[1]), stacked.params)
    params = jax.tree_util.tree_map(
        lambda s, m: s.at[1].set(m), stacked.params, member1
    )
    stacked = stacked._replace(params=params)

    scores = selection_scores(
        tr, stacked, 2, n_points=512, coarse_scales=(2.0, 8.0)
    )
    for s in ("2", "8"):
        assert np.isfinite(scores[0][f"coarse_r{s}"])
        assert np.isfinite(scores[0][f"coarse_ent{s}"])
        assert scores[0][f"coarse_r{s}"] < scores[1][f"coarse_r{s}"]
    assert select_member(scores, by="coarse_r8") == 0
    # default call: no coarse keys, byte-compatible with existing flows
    assert "coarse_r2" not in selection_scores(tr, stacked, 2,
                                               n_points=256)[0]


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


def test_ensemble_hybrid_matches_solo(tmp_path):
    """The reference farm's actual payload — the hybrid Adam -> L-BFGS
    schedule (Abgrall_ADMM.py:210-217) — runs vmapped; member trajectories
    match solo runs."""
    from pinns_tpu.parallel.ensemble import run_ensemble

    updates = {
        "model.layers": (2, 12, 12, 1),
        "sampling.n_f": 128,
        "train.epochs": 10,
        "train.chunk": 6,
        "optimizer.kind": "hybrid",
        "optimizer.switch_epoch": 6,
        "optimizer.lbfgs.max_iters": 15,
        "train.out_dir": str(tmp_path),
    }
    tr = Trainer(_exp(**updates))
    seeds = [0, 1]
    stacked, summaries = run_ensemble(tr, seeds)
    assert len(summaries) == 2
    assert int(np.asarray(stacked.epoch)[0]) == 10

    # member i == a solo hybrid run with the same seed (vmap only reorders
    # reductions, so agreement is to tolerance, not bit-exact)
    for i, seed in enumerate(seeds):
        solo_tr = Trainer(_exp(**dict(updates, **{"train.out_dir": ""})))
        solo, solo_summary = solo_tr.train(solo_tr.init_state(seed=seed))
        np.testing.assert_allclose(
            summaries[i]["rel_l2_u"], solo_summary["rel_l2_u"],
            rtol=1e-3, atol=1e-5,
        )
        w_ens = np.asarray(
            jax.tree_util.tree_map(lambda x: x[i], stacked).params["net"][0]["W"]
        )
        w_solo = np.asarray(solo.params["net"][0]["W"])
        # line-search accept/zoom branches amplify vmap's reduction-order
        # differences, so weights agree loosely while quality agrees tightly
        np.testing.assert_allclose(w_ens, w_solo, rtol=5e-2, atol=5e-3)


def test_ensemble_swa_matches_solo(tmp_path):
    """SWA tail averaging inside the vmapped ensemble: every member gets its
    own average, matching a solo run with the same seed."""
    from pinns_tpu.parallel.ensemble import run_ensemble

    updates = {
        "model.layers": (2, 12, 12, 1),
        "sampling.n_f": 128,
        "train.epochs": 30,
        "train.chunk": 10,
        "train.swa_frac": 0.5,
        "train.out_dir": str(tmp_path),
    }
    tr = Trainer(_exp(**updates))
    seeds = [0, 1]
    _, summaries = run_ensemble(tr, seeds)
    # window=(15, 30] with chunk 10 -> snapshots at 20 and 30
    for s in summaries:
        assert s["swa_snapshots"] == 2
        assert np.isfinite(s["swa_rel_l2_u"])
    assert (tmp_path / f"{tr.exp.name}_swa_m0.ckpt").exists()
    assert (tmp_path / f"{tr.exp.name}_swa_m1.ckpt").exists()

    solo_tr = Trainer(_exp(**dict(updates, **{"train.out_dir": ""})))
    _, solo_summary = solo_tr.train(solo_tr.init_state(seed=1))
    np.testing.assert_allclose(
        summaries[1]["swa_rel_l2_u"], solo_summary["swa_rel_l2_u"],
        rtol=1e-3, atol=1e-5,
    )


def test_ensemble_predict_mean_std():
    """Deep-ensemble UQ: one vmapped forward gives per-field mean/std whose
    member rows match solo predictions."""
    from pinns_tpu.parallel.ensemble import ensemble_predict

    tr = Trainer(_exp(**{"model.layers": (2, 12, 12, 1), "sampling.n_f": 128}))
    stacked = init_ensemble_states(tr, seeds=[0, 1, 2])
    x = tr.problem.dataset.X_star[:50]
    out = ensemble_predict(tr, stacked, x)
    assert out["u"]["members"].shape == (3, 50, 1)
    assert out["u"]["mean"].shape == (50, 1)
    assert np.all(out["u"]["std"] >= 0)
    np.testing.assert_allclose(
        out["u"]["mean"], out["u"]["members"].mean(axis=0), rtol=1e-5, atol=1e-6
    )
    # member row 1 == solo prediction with the same params
    solo = tr.predict(tr.init_state(seed=1).params, x)
    np.testing.assert_allclose(
        out["u"]["members"][1], solo["u"], rtol=1e-5, atol=1e-6
    )


def test_run_ensemble_produces_solo_artifact_set(tmp_path):
    """Ensemble runs emit the same observability artifacts as solo runs:
    metrics JSONL, snapshot CSVs, and checkpoints — per member."""
    import json as _json

    from pinns_tpu.parallel.ensemble import run_ensemble

    exp = _exp(**{
        "sampling.n_f": 128,
        "train.epochs": 20,
        "train.chunk": 10,
        "train.log_every": 10,
        "train.snapshot_every": 10,
        "train.checkpoint_every": 20,
        "train.out_dir": str(tmp_path),
    })
    tr = Trainer(exp)
    run_ensemble(tr, seeds=[0, 1])
    name = exp.name
    # member 0 uses the solo run's artifact names; member 1 gets _m1 names
    assert (tmp_path / f"{name}_metrics.jsonl").exists()
    assert (tmp_path / f"{name}_m1_metrics.jsonl").exists()
    assert (tmp_path / f"{name}_snapshots.csv").exists()
    assert (tmp_path / f"{name}_m1_snapshots.csv").exists()
    assert (tmp_path / f"{name}_e20_m0.ckpt").exists()
    assert (tmp_path / f"{name}_final_m1.ckpt").exists()
    records = [
        _json.loads(l) for l in open(tmp_path / f"{name}_m1_metrics.jsonl")
    ]
    assert any("loss" in r for r in records)
    assert any("summary" in r for r in records)


def test_uq_calibration_coverage_fields():
    """uq_calibration returns per-field coverage fractions in [0,1] with the
    shock-decile split; a trained toy ensemble should cover a nonzero
    fraction at 2 sigma."""
    from pinns_tpu.parallel.ensemble import run_ensemble, uq_calibration

    tr = Trainer(_exp(**{
        "model.layers": (2, 12, 12, 1),
        "sampling.n_f": 128,
        "train.epochs": 200,
        "train.chunk": 100,
    }))
    stacked, _ = run_ensemble(tr, seeds=[0, 1, 2, 3])
    cal = uq_calibration(tr, stacked)
    row = cal["u"]
    for k in ("cov1s", "cov2s", "cov3s", "cov2s_shock"):
        assert 0.0 <= row[k] <= 1.0, (k, row[k])
    assert row["cov1s"] <= row["cov2s"] <= row["cov3s"]
    assert row["cov2s"] > 0.0
    assert row["mean_std"] > 0.0 and row["rmse"] > 0.0
    # k95: inflating std by k95 gives >= 95% coverage by construction
    assert row["k95"] > 0.0


def test_conformal_calibration_fixes_overconfidence():
    """Split-conformal on a controlled Gaussian: with an 8x overconfident
    std (the measured deep-ensemble regime, PARITY 4n), the conformal band
    mean +- k_conf95*std restores ~95% coverage on the held-out remainder,
    while the raw 2-sigma band covers far less."""
    from pinns_tpu.parallel.ensemble import calibration_stats

    rng = np.random.default_rng(42)
    n = 20_000
    sigma = 0.1 * (1.0 + rng.random(n))  # heteroscedastic truth scale
    exact = np.zeros(n)
    mean = rng.normal(0.0, sigma)        # |err| = sigma * |N(0,1)|
    std = sigma / 8.0                    # ensemble 8x overconfident
    row = calibration_stats(exact, mean, std, grad_mag=np.abs(mean))
    assert row["cov2s"] < 0.35           # raw band badly undercovers
    # conformal quantile recovers ~8 * 1.96
    assert 12.0 < row["k_conf95"] < 20.0
    assert 0.93 <= row["cov_conf95"] <= 0.97
    assert 0.0 <= row["cov_conf95_shock"] <= 1.0

    # calibrated (std already = truth scale): k_conf95 ~ 1.96, same coverage
    row2 = calibration_stats(exact, mean, sigma)
    assert 1.7 < row2["k_conf95"] < 2.3
    assert 0.93 <= row2["cov_conf95"] <= 0.97


def test_mondrian_conformal_fixes_conditional_coverage():
    """Mondrian (std-binned) conformal on a controlled case where the
    miscalibration factor varies WITH the predicted std — the measured
    shock regime (PARITY 4n: global conformal covers ~95% marginally but
    only ~0.7 at the front, where std is largest and most overconfident).
    One global quantile must under-cover the high-std region; per-std-bin
    quantiles restore near-nominal coverage there by exchangeability
    within the bin."""
    from pinns_tpu.parallel.ensemble import calibration_stats

    rng = np.random.default_rng(7)
    n = 40_000
    std = 0.01 + 0.09 * rng.random(n)          # predicted sigma
    c = np.where(std > np.quantile(std, 0.75), 12.0, 2.0)
    exact = np.zeros(n)
    mean = rng.normal(0.0, c * std)            # true err scale = c * std
    # "shock" = top std decile (inside the badly miscalibrated quartile)
    row = calibration_stats(exact, mean, std, grad_mag=std)
    assert len(row["mond_k"]) == 4 and len(row["mond_edges"]) == 3
    # the top bin's factor reflects its own miscalibration (~12*1.96),
    # the bottom bins stay tight (~2*1.96) — sharper AND safer than global
    assert row["mond_k"][-1] > 1.5 * row["k_conf95"] > row["mond_k"][0]
    assert row["cov_conf95_shock"] < 0.88     # global quantile under-covers
    assert row["cov_mond95_shock"] >= 0.90    # Mondrian restores it
    assert 0.92 <= row["cov_mond95"] <= 0.98

    # degenerate tiny input: too few calibration points to split for the
    # edge/score halves — Mondrian keys are simply absent, nothing raises
    tiny = calibration_stats(exact[:6], mean[:6], std[:6])
    assert "mond_k" not in tiny and tiny["k_conf95"] > 0.0


def test_front_aware_mondrian_bins_fix_unresolved_front():
    """VERDICT-r3 #6 regime (the measured rho flank, PARITY 4n): the
    predicted std does NOT resolve the front — here it is constant — while
    the true error blows up there. Std-binned Mondrian degenerates to the
    global quantile and under-covers the front; binning on a front-aware
    feature (predicted |dx|, serving-time computable) restores near-95%
    conditional coverage. Bands stay k * std — only WHICH k changes."""
    from pinns_tpu.parallel.ensemble import (
        calibration_stats,
        mond_band_factors,
    )

    rng = np.random.default_rng(11)
    n = 40_000
    x = rng.random(n)
    dx = np.exp(-((x - 0.5) ** 2) / (2 * 0.03**2))  # front proxy |du/dx|
    std = np.full(n, 0.05)                          # uninformative
    c = np.where(dx > np.quantile(dx, 0.75), 12.0, 2.0)
    exact = np.zeros(n)
    mean = rng.normal(0.0, c * std)
    # shock mask (top |grad| decile) sits inside the miscalibrated quartile
    row_std = calibration_stats(exact, mean, std, grad_mag=dx)
    row_dx = calibration_stats(exact, mean, std, grad_mag=dx,
                               bin_feature=dx, feature_name="dx")
    assert row_std["mond_feature"] == "std"
    assert row_dx["mond_feature"] == "dx"
    # constant std: every point lands in one bin -> global behavior
    assert row_std["cov_mond95_shock"] < 0.88
    # dx bins isolate the front population -> conditional coverage back
    assert row_dx["cov_mond95_shock"] >= 0.90
    assert 0.92 <= row_dx["cov_mond95"] <= 0.98
    # per-point factors bin on the FEATURE; the front gets the top factor
    ks = mond_band_factors(row_dx, std, feature=dx)
    assert ks[np.argmax(dx)] == pytest.approx(max(row_dx["mond_k"]))
    assert ks[np.argmin(dx)] == pytest.approx(row_dx["mond_k"][0])
    # a dx-calibrated row WITHOUT the dx feature must NOT bin the std
    # values against |dx| edges (silently wrong bins) — it falls back to
    # the constant global conformal factor, like ServedModel.band_ks
    ks_nofeat = mond_band_factors(row_dx, std)
    np.testing.assert_allclose(ks_nofeat, row_dx["k_conf95"])
    # and the mirror trap: a dx array passed to a STD-calibrated row must
    # be ignored (binned on std, like ServedModel.band_ks), not silently
    # binned against std edges
    np.testing.assert_allclose(
        mond_band_factors(row_std, std, feature=dx),
        mond_band_factors(row_std, std),
    )


def test_uq_calibration_reports_conformal_keys():
    from pinns_tpu.parallel.ensemble import run_ensemble, uq_calibration

    tr = Trainer(_exp(**{
        "model.layers": (2, 12, 12, 1),
        "sampling.n_f": 128,
        "train.epochs": 100,
        "train.chunk": 100,
    }))
    stacked, _ = run_ensemble(tr, seeds=[0, 1])
    row = uq_calibration(tr, stacked)["u"]
    assert row["k_conf95"] > 0.0
    # conformal coverage on the disjoint remainder is near-nominal by
    # exchangeability (wide tolerance: tiny ensemble, spatially correlated
    # errors on a grid)
    assert row["cov_conf95"] >= 0.80


def test_member_sharding_compiles_zero_collectives():
    """Pin the member-sharded-ensemble scaling guarantee (PARITY §6,
    r4_ensemble_shard.jsonl): the ensemble=E x data=1 placement of the real
    weak-form Euler training chunk partitions with ZERO cross-member
    collectives — the compiler-level equivalent of the reference farm's
    embarrassingly-parallel ranks (scheduler.py:97-109). Any future change
    to the step (e.g. a new cross-member metric reduction) that introduces
    a collective breaks this test instead of silently voiding the claim."""
    from pinns_tpu.parallel.sharding import collective_census

    exp = override(get_preset("euler_weak_fast"), {
        # narrower trunk for test speed; same step structure (weak-form
        # flux + paths + per-member metrics) as the measured census
        "model.layers": (2, 32, 32, 3),
        "sampling.n_f": 256,
        "sampling.t_curriculum_epochs": 0,
        "train.log_every": 0,
    })
    tr = Trainer(exp)
    seeds = [exp.train.seed + i for i in range(8)]
    run = make_ensemble_chunk(tr, 5)

    ens = place_ensemble(
        init_ensemble_states(tr, seeds), make_mesh(ensemble=8)
    )
    hlo_ens = run.lower(ens).compile().as_text()
    assert collective_census(hlo_ens) == {}, (
        "member sharding must stay collective-free; got "
        f"{collective_census(hlo_ens)}"
    )

    # contrast leg doubles as a regex-staleness guard: collocation-DP MUST
    # show the loss/grad all-reduce — if the census pattern ever stops
    # matching real HLO, this assertion fails rather than the one above
    # passing vacuously
    dp = place_ensemble(
        init_ensemble_states(tr, seeds), make_mesh(ensemble=1)
    )
    cc_dp = collective_census(run.lower(dp).compile().as_text())
    assert cc_dp.get("all-reduce", 0) >= 1, f"DP census lost its all-reduce: {cc_dp}"


def test_select_member_rank_sum():
    """`by='rank'` (Borda agreement of residual score + consensus) picks
    the oracle on BOTH measured TPU instances where each single signal
    failed one (PARITY §4r/§4t): pinned here with the actual measured
    score/consensus vectors (r4/r5_euler_best.jsonl; oracle members 1 and
    1, score picked 5 on base1234, consensus picked 5 on base7000)."""
    from pinns_tpu.parallel.ensemble import select_member

    base1234 = [
        {"score": s, "consensus": c} for s, c in zip(
            [.021888, .003509, .006631, .03445, .003223, .002726, .043615,
             .011471],
            [.071141, .026588, .028563, .071201, .030046, .074444, .092407,
             .069672])
    ]
    base7000 = [
        {"score": s, "consensus": c} for s, c in zip(
            [.006873, .00151, .004704, .00281, .010074, .005617, .002874,
             .007938],
            [.026584, .019105, .020299, .025023, .080164, .018543, .040673,
             .087509])
    ]
    assert select_member(base1234, by="score") == 5      # regret .1031
    assert select_member(base1234, by="consensus") == 1  # oracle
    assert select_member(base1234, by="rank") == 1       # oracle
    assert select_member(base7000, by="score") == 1      # oracle
    assert select_member(base7000, by="consensus") == 5  # regret .0173
    assert select_member(base7000, by="rank") == 1       # oracle

    with pytest.raises(ValueError, match="anchor_params"):
        select_member([{"score": 1.0}], by="rank")
