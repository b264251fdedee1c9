import json
import os

import numpy as np
import pytest

from pinns_tpu.cli import main as cli_main

HAVE_REF = os.path.isdir("/root/reference")
pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")

SMALL = [
    "--set", "model.layers=(2,12,12,1)",
    "--set", "sampling.n_f=256",
    "--set", "train.chunk=50",
]


def test_cli_presets(capsys):
    assert cli_main(["presets"]) == 0
    out = capsys.readouterr().out
    assert "abgrall_admm" in out and "euler_admm" in out


def test_cli_train_eval_plot_animate(tmp_path, capsys):
    out_dir = str(tmp_path)
    rc = cli_main(
        ["train", "--preset", "abgrall_l2", *SMALL,
         "--epochs", "100", "--out-dir", out_dir,
         "--set", "train.snapshot_every=50"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    summary = json.loads(out.strip().splitlines()[-1])
    assert "rel_l2_u" in summary

    ckpt = os.path.join(out_dir, "abgrall_l2_final.ckpt")
    assert os.path.exists(ckpt)
    rc = cli_main(["eval", "--preset", "abgrall_l2", *SMALL, "--checkpoint", ckpt])
    assert rc == 0
    evald = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    np.testing.assert_allclose(evald["rel_l2_u"], summary["rel_l2_u"], rtol=1e-5)

    fig = os.path.join(out_dir, "fig.png")
    rc = cli_main(
        ["plot", "--preset", "abgrall_l2", *SMALL, "--checkpoint", ckpt,
         "--out", fig]
    )
    assert rc == 0 and os.path.getsize(fig) > 10_000

    snap = os.path.join(out_dir, "abgrall_l2_snapshots.csv")
    fig2 = os.path.join(out_dir, "fig_snap.png")
    rc = cli_main(
        ["plot", "--preset", "abgrall_l2", *SMALL, "--snapshots", snap,
         "--out", fig2]
    )
    assert rc == 0 and os.path.exists(fig2)

    anim = os.path.join(out_dir, "conv.gif")  # no ffmpeg assumption
    rc = cli_main(
        ["animate", "--preset", "abgrall_l2", *SMALL, "--snapshots", snap,
         "--out", anim, "--fps", "2"]
    )
    assert rc == 0
    assert os.path.exists(anim)


def test_cli_train_ensemble_select(tmp_path, capsys):
    """--ensemble E --select emits a ground-truth-free pick with a real
    member checkpoint path."""
    out_dir = str(tmp_path)
    rc = cli_main(
        ["train", "--preset", "abgrall_l2", *SMALL,
         "--epochs", "60", "--out-dir", out_dir,
         "--ensemble", "2", "--select"]
    )
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    pick = json.loads(lines[-1])
    assert pick["selected_member"] in (0, 1)
    assert len(pick["scores"]) == 2
    assert all(np.isfinite(s["score"]) for s in pick["scores"])
    assert os.path.exists(os.path.join(out_dir, pick["checkpoint"]))


def test_cli_sweep(tmp_path, capsys):
    out = os.path.join(str(tmp_path), "sweep.jsonl")
    rc = cli_main(
        ["sweep", "--preset", "abgrall_l2", *SMALL, "--epochs", "40",
         "--grid", "loss.rho=10.0,40.0", "--out", out]
    )
    assert rc == 0
    lines = [json.loads(l) for l in open(out)]
    assert len(lines) == 2
    assert all(l["status"] == "ok" for l in lines)


def test_cli_bad_set():
    with pytest.raises(SystemExit):
        cli_main(["train", "--preset", "abgrall_l2", "--set", "nonsense"])


def test_cli_euler_plot(tmp_path):
    out_dir = str(tmp_path)
    rc = cli_main(
        ["train", "--preset", "euler_admm",
         "--set", "model.layers=(2,12,12,3)",
         "--set", "sampling.n_f=128",
         "--set", "train.chunk=25",
         "--epochs", "50", "--out-dir", out_dir]
    )
    assert rc == 0
    ckpt = os.path.join(out_dir, "euler_admm_final.ckpt")
    fig = os.path.join(out_dir, "euler.png")
    rc = cli_main(
        ["plot", "--preset", "euler_admm",
         "--set", "model.layers=(2,12,12,3)",
         "--set", "sampling.n_f=128",
         "--checkpoint", ckpt, "--out", fig]
    )
    assert rc == 0 and os.path.getsize(fig) > 10_000


def test_euler_animate(tmp_path):
    out_dir = str(tmp_path)
    rc = cli_main(
        ["train", "--preset", "euler_admm",
         "--set", "model.layers=(2,12,12,3)",
         "--set", "sampling.n_f=128",
         "--set", "train.chunk=25",
         "--set", "train.snapshot_every=25",
         "--epochs", "50", "--out-dir", out_dir]
    )
    assert rc == 0
    snap = os.path.join(out_dir, "euler_admm_snapshots.csv")
    anim = os.path.join(out_dir, "rho_conv.gif")
    rc = cli_main(
        ["animate", "--preset", "euler_admm",
         "--set", "model.layers=(2,12,12,3)",
         "--snapshots", snap, "--field", "rho", "--out", anim, "--fps", "2"]
    )
    assert rc == 0 and os.path.getsize(anim) > 5000


def test_cli_polish(tmp_path):
    """f64 polish improves (or at least does not worsen) a tiny checkpoint."""
    out_dir = str(tmp_path)
    rc = cli_main(
        ["train", "--preset", "burgers_forward",
         "--set", "model.layers=(2,12,12,1)",
         "--set", "sampling.n_f=256", "--set", "sampling.strategy=fixed_lhs",
         "--set", "train.chunk=100", "--set", "optimizer.kind=adam",
         "--epochs", "300", "--out-dir", out_dir]
    )
    assert rc == 0
    ckpt = os.path.join(out_dir, "burgers_forward_final.ckpt")
    rc = cli_main(
        ["polish", "--preset", "burgers_forward",
         "--set", "model.layers=(2,12,12,1)",
         "--set", "sampling.n_f=256", "--set", "sampling.strategy=fixed_lhs",
         "--checkpoint", ckpt, "--max-iters", "100"]
    )
    assert rc == 0
    assert os.path.exists(ckpt + ".polished.ckpt")


def test_plot_uncertainty(tmp_path):
    """ensemble_predict output renders as a std heatmap + ±2σ band figure."""
    from pinns_tpu.experiments import get_preset
    from pinns_tpu.config import override
    from pinns_tpu.parallel.ensemble import ensemble_predict, init_ensemble_states
    from pinns_tpu.train import Trainer
    from pinns_tpu.viz.plots import plot_uncertainty

    exp = override(get_preset("abgrall_l2"), {
        "model.layers": (2, 12, 12, 1), "sampling.n_f": 128,
    })
    tr = Trainer(exp)
    stacked = init_ensemble_states(tr, seeds=[0, 1, 2])
    uq = ensemble_predict(tr, stacked, tr.problem.dataset.X_star)
    out = plot_uncertainty(
        tr.problem.dataset, uq, out_path=str(tmp_path / "uq.png"),
        title="test",
    )
    assert os.path.exists(out) and os.path.getsize(out) > 10_000

    # Mondrian bands: the whole uq_calibration dict selects per-point
    # factors (std-binned conformal) instead of one global band_k
    from pinns_tpu.parallel.ensemble import uq_calibration

    out2 = plot_uncertainty(
        tr.problem.dataset, uq, out_path=str(tmp_path / "uq_mond.png"),
        calibration=uq_calibration(tr, stacked),
    )
    assert os.path.exists(out2) and os.path.getsize(out2) > 10_000


def test_plot_uncertainty_front_aware_calibration(tmp_path):
    """A mond_feature='dx' calibration draws per-point bands binned on the
    predicted |du/dx| when the uq dict carries it (ensemble_predict
    want_dx=True), and falls back to the global conformal factor — never
    std-binned-on-dx-edges — when it does not."""
    from pinns_tpu.config import override
    from pinns_tpu.experiments import get_preset
    from pinns_tpu.parallel.ensemble import (
        ensemble_predict,
        init_ensemble_states,
        uq_calibration,
    )
    from pinns_tpu.train import Trainer
    from pinns_tpu.viz.plots import plot_uncertainty

    exp = override(get_preset("abgrall_l2"), {
        "model.layers": (2, 12, 12, 1), "sampling.n_f": 128,
    })
    tr = Trainer(exp)
    stacked = init_ensemble_states(tr, seeds=[0, 1, 2])
    cal = uq_calibration(tr, stacked, mond_feature="dx")
    assert cal["u"]["mond_feature"] == "dx"
    # with the dx feature present: binned per-point factors
    uq_dx = ensemble_predict(tr, stacked, tr.problem.dataset.X_star,
                             want_dx=True)
    assert "dx" in uq_dx["u"]
    out = plot_uncertainty(
        tr.problem.dataset, uq_dx, out_path=str(tmp_path / "uq_dx.png"),
        calibration=cal,
    )
    assert os.path.exists(out) and os.path.getsize(out) > 10_000
    # without it: must still render (global-factor fallback inside)
    uq_plain = ensemble_predict(tr, stacked, tr.problem.dataset.X_star)
    out2 = plot_uncertainty(
        tr.problem.dataset, uq_plain,
        out_path=str(tmp_path / "uq_dx_nofeat.png"), calibration=cal,
    )
    assert os.path.exists(out2) and os.path.getsize(out2) > 10_000
