import json
import os

import numpy as np
import pytest

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.parallel.sweep import SweepResult, cartesian_grid, run_sweep

HAVE_REF = os.path.isdir("/root/reference")


def test_cartesian_grid():
    grid = cartesian_grid({"a": [1, 2], "b": ["x", "y", "z"]})
    assert len(grid) == 6
    assert {"a": 1, "b": "x"} in grid and {"a": 2, "b": "z"} in grid
    assert cartesian_grid({}) == [{}]


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_sweep_records_failures_and_keeps_farming(tmp_path):
    base = override(
        get_preset("abgrall_l2"),
        {
            "model.layers": (2, 8, 8, 1),
            "sampling.n_f": 128,
            "train.chunk": 20,
        },
    )
    # one invalid config (bad layers: in_dim 3 vs lb/ub len 2 triggers a
    # build error), one valid
    grid = [
        {"model.layers": (3, 8, 1)},
        {"loss.rho": 10.0},
    ]
    out = str(tmp_path / "res.jsonl")
    results = run_sweep(base, grid, retries=1, out_path=out, epochs=20)
    statuses = {json.dumps(r.overrides): r.status for r in results}
    assert statuses[json.dumps(grid[0])] == "failed"
    assert statuses[json.dumps(grid[1])] == "ok"
    failed = [r for r in results if r.status == "failed"][0]
    assert failed.attempts == 2  # retried once
    assert failed.error and "lb/ub" in failed.error
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 2


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_sweep_seed_grouping_uses_ensemble(tmp_path):
    base = override(
        get_preset("abgrall_l2"),
        {
            "model.layers": (2, 8, 8, 1),
            "sampling.n_f": 128,
            "train.chunk": 20,
            "optimizer.kind": "adam",
        },
    )
    grid = cartesian_grid({"train.seed": [0, 1, 2]})
    results = run_sweep(base, grid, epochs=20)
    assert len(results) == 3
    assert all(r.status == "ok" for r in results)
    # distinct seeds gave distinct outcomes
    errs = [r.summary["rel_l2_u"] for r in results]
    assert len(set(np.round(errs, 10))) == 3


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_sweep_rho_axis_vmapped():
    """The reference's rho sweep axis collapses into one vmapped group."""
    base = override(
        get_preset("abgrall_admm"),
        {
            "model.layers": (2, 8, 8, 1),
            "sampling.n_f": 128,
            "train.chunk": 10,
            "optimizer.kind": "adam",
        },
    )
    grid = cartesian_grid({"loss.rho": [0.1, 10.0, 100.0]})
    results = run_sweep(base, grid, epochs=100)
    assert len(results) == 3
    assert all(r.status == "ok" for r in results)
    errs = [r.summary["rel_l2_u"] for r in results]
    assert len(set(np.round(errs, 10))) >= 2  # rho actually had an effect


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_sweep_hybrid_schedule_vmapped(monkeypatch):
    """The reference sweep envelope's ACTUAL schedule — hybrid Adam->L-BFGS
    (scheduler.py:146-150 sweeping Abgrall_ADMM.py:66-73) — runs as one
    vmapped group, not serial per-member fallbacks."""
    import pinns_tpu.parallel.ensemble as ens

    calls = []
    real = ens.run_ensemble

    def spy(trainer, seeds, **kw):
        calls.append(list(seeds))
        return real(trainer, seeds, **kw)

    monkeypatch.setattr(ens, "run_ensemble", spy)
    base = override(
        get_preset("abgrall_admm"),
        {
            "model.layers": (2, 8, 8, 1),
            "sampling.n_f": 128,
            "train.chunk": 5,
            "optimizer.kind": "hybrid",
            "optimizer.switch_epoch": 5,
            "optimizer.lbfgs.max_iters": 10,
        },
    )
    grid = cartesian_grid({"loss.rho": [5.0, 40.0]})
    results = run_sweep(base, grid, epochs=8)
    assert all(r.status == "ok" for r in results)
    assert calls == [[1234, 1234]]  # ONE vmapped group of 2 members
    errs = [r.summary["rel_l2_u"] for r in results]
    assert len(set(np.round(errs, 10))) == 2  # rho had an effect


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_sweep_serial_fallback_is_logged(capsys):
    base = override(
        get_preset("abgrall_l2"),
        {
            "model.layers": (2, 8, 8, 1),
            "sampling.n_f": 128,
            "train.chunk": 10,
            "optimizer.kind": "adam",
        },
    )
    # duplicate configs with no vmappable axis -> per-member units, visibly
    results = run_sweep(base, [{}, {}], epochs=10, concurrent=False)
    assert all(r.status == "ok" for r in results)
    out = capsys.readouterr().out
    assert "serial units" in out and "can't vmap" in out


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_sweep_concurrent_units_overlap(capsys):
    """Shape-heterogeneous grids (the reference envelope's N_f axis,
    scheduler.py:97-109) must dispatch as CONCURRENT units over the local
    devices: distinct device placements and genuinely overlapping execution
    spans. (This 1-core CI box can't show a wall-clock win for
    compute-bound CPU programs — the overlap + placement is the pinned
    evidence that distinct jit specializations run simultaneously on
    distinct devices, which is what turns into wall-clock on a real
    multi-chip slice.)"""
    import jax

    if len(jax.local_devices()) < 2:
        pytest.skip("needs >= 2 devices")
    base = override(
        get_preset("abgrall_l2"),
        {
            "sampling.n_f": 256,
            "train.chunk": 50,
            "optimizer.kind": "adam",
        },
    )
    # three DIFFERENT static shapes -> three units, no vmap possible
    grid = [
        {"model.layers": (2, 8, 8, 1)},
        {"model.layers": (2, 10, 10, 1)},
        {"model.layers": (2, 12, 12, 1)},
    ]
    results = run_sweep(base, grid, epochs=300)
    assert all(r.status == "ok" for r in results)
    # results come back in grid order regardless of completion order
    assert [r.overrides for r in results] == grid
    out = capsys.readouterr().out
    assert "concurrently over" in out
    devices = {r.device for r in results}
    assert len(devices) >= 2 and all(d is not None for d in devices)
    # at least one pair on distinct devices must have overlapping spans
    overlapped = any(
        a.t_start < b.t_end and b.t_start < a.t_end
        for i, a in enumerate(results)
        for b in results[i + 1:]
        if a.device != b.device
    )
    assert overlapped


@pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")
def test_sweep_rad_strategy_falls_back_to_serial():
    """RAD configs can't vmapp-ensemble (re-draws live in Trainer.train) —
    the group must degrade to serial runs and still succeed."""
    base = override(
        get_preset("abgrall_l2"),
        {
            "model.layers": (2, 8, 8, 1),
            "sampling.n_f": 128,
            "sampling.strategy": "rad",
            "sampling.rad_pool_factor": 2,
            "train.chunk": 10,
            "optimizer.kind": "adam",
        },
    )
    grid = cartesian_grid({"train.seed": [0, 1]})
    results = run_sweep(base, grid, epochs=20)
    assert len(results) == 2
    assert all(r.status == "ok" for r in results)
