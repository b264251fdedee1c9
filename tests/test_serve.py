"""Export/serving path: StableHLO artifacts round-trip and match the trainer."""

import os

import numpy as np
import pytest

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.serve import export_predict, load_exported
from pinns_tpu.train import Trainer

HAVE_REF = os.path.isdir("/root/reference")
pytestmark = pytest.mark.skipif(not HAVE_REF, reason="reference data not mounted")


def _trained(preset, **updates):
    base = {
        "model.layers": (2, 12, 12, 1),
        "sampling.n_f": 128,
        "train.epochs": 100,
        "train.chunk": 50,
    }
    base.update(updates)
    tr = Trainer(override(get_preset(preset), base))
    state, _ = tr.train()
    return tr, state


def test_export_roundtrip_matches_trainer(tmp_path):
    tr, state = _trained("abgrall_l2")
    path = export_predict(tr, state.params, str(tmp_path / "m"))
    served = load_exported(path)
    assert served.fields == ["f", "u"]
    x = tr.problem.dataset.X_star[:77]  # odd N exercises the symbolic batch
    want = tr.predict(state.params, x)
    got = served.predict(x)
    for k in ("u", "f"):
        np.testing.assert_allclose(got[k], want[k], rtol=1e-5, atol=1e-6)


def test_export_is_cross_platform(tmp_path):
    """The artifact must lower for cpu+tpu+cuda at export time — jax.export
    otherwise bakes in only the exporting platform, and a TPU-trained
    artifact refuses to serve on CPU (caught live on the chip by
    benchmarks/uq_export_study.py round-trip)."""
    tr, state = _trained("abgrall_l2")
    path = export_predict(tr, state.params, str(tmp_path / "m"))
    served = load_exported(path)
    assert set(served._exported.platforms) == {"cpu", "tpu", "cuda"}


def test_export_euler_multifield(tmp_path):
    tr, state = _trained("euler_admm", **{"model.layers": (2, 16, 16, 3)})
    path = export_predict(tr, state.params, str(tmp_path / "m"))
    served = load_exported(path)
    assert set(served.fields) == {"rho", "u", "E", "f1", "f2", "f3"}
    x = tr.problem.dataset.X_star[:33]
    want = tr.predict(state.params, x)
    got = served.predict(x)
    np.testing.assert_allclose(got["rho"], want["rho"], rtol=1e-5, atol=1e-6)


_ENS8_DX = "benchmarks/results/r4_artifacts/euler_ens8_dx"


@pytest.mark.skipif(not os.path.isdir(_ENS8_DX), reason="committed artifact absent")
def test_committed_ens8_dx_artifact_serves_on_cpu():
    """The committed round-4 deliverable (PARITY §4r): the dx-calibrated
    8-member Euler ensemble artifact loads with jax alone on CPU, serves
    mean+std+band fields, and its baked calibration is the dx taxonomy
    with the measured shock coverage (>=.94 per field)."""
    served = load_exported(_ENS8_DX)
    assert served.meta["ensemble_members"] == 8
    assert "cpu" in served._exported.platforms
    for field in ("rho", "u", "E"):
        cal = served.meta["calibration"][field]
        assert cal["mond_feature"] == "dx"
        assert cal["cov_mond95_shock"] >= 0.94
        assert cal["cov_mond95"] >= 0.95
    out = served.predict(np.array([[0.25, 0.1], [0.75, 0.15]], np.float32))
    for field in ("rho", "u", "E"):
        assert out[field].shape == (2, 1)
        assert np.all(np.isfinite(out[field]))
        assert out[f"{field}_std"].shape == (2, 1)
        assert out[f"{field}_dx"].shape == (2, 1)


def test_export_artifact_is_self_contained(tmp_path):
    """Loading uses only the artifact dir — no Experiment/preset needed."""
    tr, state = _trained("abgrall_l2")
    path = export_predict(tr, state.params, str(tmp_path / "m"))
    assert (tmp_path / "m" / "model.shlo").exists()
    assert (tmp_path / "m" / "meta.json").exists()
    served = load_exported(path)
    assert served.meta["pde"] == "burgers"
    out = served.predict(np.zeros((5, 2)))
    assert out["u"].shape == (5, 1)


def test_cli_export(tmp_path):
    from pinns_tpu.cli import main as cli_main

    out_dir = str(tmp_path)
    rc = cli_main([
        "train", "--preset", "abgrall_l2", "--epochs", "100",
        "--set", "model.layers=(2,12,12,1)", "--set", "sampling.n_f=128",
        "--set", "train.chunk=50", "--out-dir", out_dir,
    ])
    assert rc == 0
    rc = cli_main([
        "export", "--preset", "abgrall_l2",
        "--set", "model.layers=(2,12,12,1)", "--set", "sampling.n_f=128",
        "--checkpoint", os.path.join(out_dir, "abgrall_l2_final.ckpt"),
        "--out", os.path.join(out_dir, "artifact"),
    ])
    assert rc == 0
    served = load_exported(os.path.join(out_dir, "artifact"))
    assert served.predict(np.zeros((3, 2)))["u"].shape == (3, 1)


def test_export_ensemble_uq(tmp_path):
    """The ensemble export serves mean + std per field from one artifact,
    matching ensemble_predict."""
    from pinns_tpu.parallel.ensemble import (
        ensemble_predict,
        init_ensemble_states,
    )
    from pinns_tpu.serve import export_ensemble

    tr, _ = _trained("abgrall_l2")
    stacked = init_ensemble_states(tr, seeds=[0, 1, 2])
    path = export_ensemble(tr, stacked.params, str(tmp_path / "ens"))
    served = load_exported(path)
    assert served.meta["ensemble_members"] == 3
    assert "u_std" in served.fields
    # provenance: full config snapshot + framework version for rollout audit
    prov = served.meta["provenance"]
    assert prov["framework"].startswith("pinns_tpu ")
    assert prov["config"]["model"]["layers"] == list(tr.exp.model.layers)
    assert prov["exported_at"].endswith("Z")
    x = tr.problem.dataset.X_star[:41]
    got = served.predict(x)
    want = ensemble_predict(tr, stacked, x)
    np.testing.assert_allclose(got["u"], want["u"]["mean"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        got["u_std"], want["u"]["std"], rtol=1e-4, atol=1e-6
    )


def test_export_ensemble_calibration_meta(tmp_path):
    """export_ensemble(calibration=...) bakes the conformal band factors
    into meta.json; band_k() serves them (and falls back to 2.0)."""
    from pinns_tpu.parallel.ensemble import init_ensemble_states, uq_calibration
    from pinns_tpu.serve import export_ensemble

    tr, _ = _trained("abgrall_l2")
    stacked = init_ensemble_states(tr, seeds=[0, 1, 2])
    cal = uq_calibration(tr, stacked)
    path = export_ensemble(tr, stacked.params, str(tmp_path / "ens"),
                           calibration=cal)
    served = load_exported(path)
    assert served.band_k("u") == pytest.approx(cal["u"]["k_conf95"])
    assert served.meta["calibration"]["u"]["cov_conf95"] == pytest.approx(
        cal["u"]["cov_conf95"]
    )
    # Mondrian std-binned factors ride along and serve per point:
    assert served.meta["calibration"]["u"]["mond_k"] == pytest.approx(
        cal["u"]["mond_k"]
    )
    edges = cal["u"]["mond_edges"]
    probe_std = np.array([0.0, *edges, edges[-1] * 10.0])
    kpt = served.band_ks("u", probe_std)
    assert kpt.shape == probe_std.shape
    assert kpt[0] == pytest.approx(cal["u"]["mond_k"][0])
    assert kpt[-1] == pytest.approx(cal["u"]["mond_k"][-1])
    # artifact without calibration: default band factor, scalar + per-point
    path2 = export_ensemble(tr, stacked.params, str(tmp_path / "ens2"))
    served2 = load_exported(path2)
    assert served2.band_k("u") == 2.0
    assert np.all(served2.band_ks("u", probe_std) == 2.0)


def test_predict_bucket_padding_exact_and_bounded(tmp_path):
    """pad_to_bucket pads to power-of-two sizes: results are exactly the
    unpadded ones for the real rows, and distinct request sizes within a
    bucket share ONE compiled program (the HTTP server's compile-set
    bound)."""
    from pinns_tpu.serve import ServedModel, export_predict

    assert ServedModel.bucket_size(1) == 64
    assert ServedModel.bucket_size(64) == 64
    assert ServedModel.bucket_size(65) == 128
    assert ServedModel.bucket_size(128) == 128
    assert ServedModel.bucket_size(1000) == 1024

    tr, state = _trained("abgrall_l2")
    path = export_predict(tr, state.params, str(tmp_path / "m"))
    served = load_exported(path)
    rng = np.random.default_rng(3)
    x = rng.uniform(-0.9, 0.9, size=(100, 2)).astype(np.float32)
    want = served.predict(x)
    got = served.predict(x, pad_to_bucket=True)
    for k in want:
        assert got[k].shape == want[k].shape
        # last-ulp only: a different padded batch size may vectorize
        # differently, but the real rows' values must not change
        np.testing.assert_allclose(got[k], want[k], rtol=2e-6, atol=1e-7)
    if hasattr(served._call, "_cache_size"):
        before = served._call._cache_size()
        for n in (65, 80, 127):  # three sizes, one 128 bucket
            served.predict(x[:n], pad_to_bucket=True)
        assert served._call._cache_size() == before  # 100 padded to 128 too


def test_export_ensemble_front_aware_dx(tmp_path):
    """mond_feature='dx' calibration: the artifact gains a `{name}_dx`
    output (the ensemble-mean |d field/dx| the bins were fit on) and
    band_ks bins on that feature; without the feature it falls back to the
    global factor rather than silently binning std on dx edges."""
    from pinns_tpu.parallel.ensemble import (
        ensemble_predict,
        init_ensemble_states,
        uq_calibration,
    )
    from pinns_tpu.serve import export_ensemble

    tr, _ = _trained("abgrall_l2")
    stacked = init_ensemble_states(tr, seeds=[0, 1, 2])
    cal = uq_calibration(tr, stacked, mond_feature="dx")
    assert cal["u"].get("mond_feature") == "dx"
    path = export_ensemble(tr, stacked.params, str(tmp_path / "ens"),
                           calibration=cal)
    served = load_exported(path)
    assert "u_dx" in served.fields
    assert served.meta["calibration"]["u"]["mond_feature"] == "dx"
    x = tr.problem.dataset.X_star[:31]
    got = served.predict(x)
    want = ensemble_predict(tr, stacked, x, want_dx=True)
    np.testing.assert_allclose(
        got["u_dx"], want["u"]["dx"], rtol=1e-4, atol=1e-6
    )
    ks = served.band_ks("u", got["u_std"], feature=got["u_dx"])
    assert ks.shape == got["u_std"].shape
    assert set(np.unique(ks)) <= set(cal["u"]["mond_k"])
    # no feature -> global factor, never std binned on dx edges
    ks_nofeat = served.band_ks("u", got["u_std"])
    assert np.all(ks_nofeat == served.band_k("u"))


def test_export_bf16_master_dtype_serves(tmp_path):
    """A bfloat16-master-dtype export must load and predict: the meta
    round-trips the dtype as the string 'bfloat16', which plain
    np.dtype(...) cannot resolve — ServedModel.predict resolves it via
    jnp.dtype (ml_dtypes)."""
    tr, state = _trained("abgrall_l2", **{"model.dtype": "bfloat16"})
    path = export_predict(tr, state.params, str(tmp_path / "m"))
    served = load_exported(path)
    assert served.meta["input"]["dtype"] == "bfloat16"
    x = tr.problem.dataset.X_star[:19].astype(np.float32)
    got = served.predict(x)
    assert np.all(np.isfinite(got["u"]))
    want = tr.predict(state.params, x)
    np.testing.assert_allclose(
        np.asarray(got["u"], np.float32),
        np.asarray(want["u"], np.float32),
        rtol=2e-2, atol=1e-2,
    )


def test_http_server_meta_and_predict(tmp_path):
    """The stdlib HTTP endpoint serves /meta and batch /predict with values
    matching ServedModel.predict, and 400s on malformed bodies."""
    import json as _json
    import threading
    import urllib.request

    from pinns_tpu.serve import make_http_server

    tr, state = _trained("abgrall_l2")
    path = export_predict(tr, state.params, str(tmp_path / "m"))
    server = make_http_server(path, port=0)  # ephemeral port
    host, port = server.server_address[:2]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(f"http://{host}:{port}/meta", timeout=30) as r:
            meta = _json.loads(r.read())
        assert meta["pde"] == "burgers"

        x = np.asarray(tr.problem.dataset.X_star[:13], np.float32)
        body = _json.dumps({"x": x.tolist()}).encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/predict", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = _json.loads(r.read())
        want = load_exported(path).predict(x)
        np.testing.assert_allclose(
            np.asarray(out["u"], np.float32), want["u"], rtol=1e-5, atol=1e-6
        )

        bad = urllib.request.Request(
            f"http://{host}:{port}/predict", data=b'{"x": [1, 2]}',
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("malformed body must 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_http_predict_serves_calibrated_bands(tmp_path):
    """POST /predict {"bands": true} on a calibrated ensemble artifact adds
    `{name}_band`: the per-point 95% half-width band_ks(name, std)*std, so
    a client needs zero framework code (or band math) for honest bands."""
    import json as _json
    import threading
    import urllib.request

    from pinns_tpu.parallel.ensemble import init_ensemble_states, uq_calibration
    from pinns_tpu.serve import export_ensemble, make_http_server

    tr, _ = _trained("abgrall_l2")
    stacked = init_ensemble_states(tr, seeds=[0, 1, 2])
    cal = uq_calibration(tr, stacked)
    path = export_ensemble(tr, stacked.params, str(tmp_path / "ens"),
                           calibration=cal)
    server = make_http_server(path, port=0)
    host, port = server.server_address[:2]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        x = np.asarray(tr.problem.dataset.X_star[:9], np.float32)
        body = _json.dumps({"x": x.tolist(), "bands": True}).encode()
        req = urllib.request.Request(
            f"http://{host}:{port}/predict", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = _json.loads(r.read())
        assert "u_band" in out
        served = load_exported(path)
        std = np.asarray(out["u_std"], np.float64)
        want = served.band_ks("u", std) * std
        np.testing.assert_allclose(
            np.asarray(out["u_band"], np.float64), want, rtol=1e-5, atol=1e-7
        )
        # without the flag the band key is absent
        body2 = _json.dumps({"x": x.tolist()}).encode()
        req2 = urllib.request.Request(
            f"http://{host}:{port}/predict", data=body2,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req2, timeout=120) as r:
            out2 = _json.loads(r.read())
        assert "u_band" not in out2
    finally:
        server.shutdown()

    # bands on an UNCALIBRATED artifact must 400, never silently serve
    # 2.0*std (measured ~10x overconfident at fronts) as a "95% band"
    path2 = export_ensemble(tr, stacked.params, str(tmp_path / "ens_nocal"))
    server2 = make_http_server(path2, port=0)
    host2, port2 = server2.server_address[:2]
    threading.Thread(target=server2.serve_forever, daemon=True).start()
    try:
        x = np.asarray(tr.problem.dataset.X_star[:3], np.float32)
        req3 = urllib.request.Request(
            f"http://{host2}:{port2}/predict",
            data=_json.dumps({"x": x.tolist(), "bands": True}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(req3, timeout=120)
            raise AssertionError("bands on uncalibrated artifact must 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "calibrate" in _json.loads(e.read())["error"]
    finally:
        server2.shutdown()


def test_cli_predict_batch_inference(tmp_path, capsys):
    """`predict` runs bulk offline inference from an artifact alone: npz
    points in -> npz fields out matching ServedModel.predict; CSV round-trip
    works; --bands on an uncalibrated artifact exits with the calibrate
    diagnostic (same policy as the HTTP service)."""
    import pytest as _pytest

    from pinns_tpu.cli import main as cli_main
    from pinns_tpu.parallel.ensemble import init_ensemble_states, uq_calibration
    from pinns_tpu.serve import export_ensemble

    tr, _ = _trained("abgrall_l2")
    stacked = init_ensemble_states(tr, seeds=[0, 1])
    x = np.asarray(tr.problem.dataset.X_star[:17], np.float32)
    np.savez(str(tmp_path / "pts.npz"), x=x)

    # calibrated artifact: npz out with bands
    cal_path = export_ensemble(tr, stacked.params, str(tmp_path / "ens_cal"),
                               calibration=uq_calibration(tr, stacked))
    rc = cli_main([
        "predict", "--artifact", cal_path,
        "--points", str(tmp_path / "pts.npz"),
        "--out", str(tmp_path / "preds.npz"), "--bands",
    ])
    assert rc == 0
    got = np.load(str(tmp_path / "preds.npz"))
    served = load_exported(cal_path)
    want = served.predict(x)
    np.testing.assert_allclose(got["u"], want["u"], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        got["u_band"],
        served.band_ks("u", want["u_std"]) * want["u_std"].astype(np.float64),
        rtol=1e-5, atol=1e-7,
    )

    # CSV points in, CSV out (header skipped on input, written on output)
    np.savetxt(str(tmp_path / "pts.csv"), x, delimiter=",", header="x,t",
               comments="")
    rc = cli_main([
        "predict", "--artifact", cal_path,
        "--points", str(tmp_path / "pts.csv"),
        "--out", str(tmp_path / "preds.csv"),
    ])
    assert rc == 0
    rows = np.loadtxt(str(tmp_path / "preds.csv"), delimiter=",", skiprows=1)
    header = open(str(tmp_path / "preds.csv")).readline().strip().split(",")
    u_col = header.index("u")
    np.testing.assert_allclose(rows[:, u_col], want["u"].ravel(),
                               rtol=1e-5, atol=1e-6)

    # --bands without calibration: loud failure, not a silent 2*std band
    nocal_path = export_ensemble(tr, stacked.params,
                                 str(tmp_path / "ens_nocal"))
    capsys.readouterr()
    with _pytest.raises(SystemExit, match="calibrate"):
        cli_main([
            "predict", "--artifact", nocal_path,
            "--points", str(tmp_path / "pts.npz"),
            "--out", str(tmp_path / "p2.npz"), "--bands",
        ])


def test_cli_export_ensemble_calibrated(tmp_path, capsys):
    """`export` with every member checkpoint + --calibrate builds one
    mean+std artifact whose meta carries the conformal band factors —
    the full train->export->serve UQ path through the CLI alone."""
    import pytest as _pytest

    from pinns_tpu.cli import main as cli_main

    out_dir = str(tmp_path)
    small = [
        "--set", "model.layers=(2,12,12,1)", "--set", "sampling.n_f=128",
        "--set", "train.chunk=50",
    ]
    rc = cli_main(
        ["train", "--preset", "abgrall_l2", *small, "--epochs", "100",
         "--ensemble", "2", "--out-dir", out_dir]
    )
    assert rc == 0
    capsys.readouterr()
    ckpts = [
        os.path.join(out_dir, f"abgrall_l2_final_m{i}.ckpt") for i in range(2)
    ]
    assert all(os.path.exists(c) for c in ckpts)

    art = os.path.join(out_dir, "ens_artifact")
    rc = cli_main(
        ["export", "--preset", "abgrall_l2", *small,
         "--checkpoint", *ckpts, "--out", art, "--calibrate"]
    )
    assert rc == 0
    lines = capsys.readouterr().out.strip().splitlines()
    assert lines[-1] == art  # calibration rows, then the artifact path
    import json as _json

    rows = [_json.loads(l) for l in lines[:-1]]
    assert any(r["field"] == "u" and "k_conf95" in r for r in rows)

    served = load_exported(art)
    assert served.meta["ensemble_members"] == 2
    assert "u_std" in served.fields
    assert served.band_k("u") == _pytest.approx(
        served.meta["calibration"]["u"]["k_conf95"]
    )
    out = served.predict(np.zeros((4, 2), np.float32))
    assert out["u"].shape == (4, 1) and out["u_std"].shape == (4, 1)


def test_cli_export_calibrate_needs_ensemble(tmp_path):
    from pinns_tpu.cli import main as cli_main

    with pytest.raises(SystemExit):
        cli_main(
            ["export", "--preset", "abgrall_l2",
             "--checkpoint", "one.ckpt", "--calibrate",
             "--out", str(tmp_path / "x")]
        )


def test_cli_eval_artifact(tmp_path, capsys):
    """`eval --artifact` grades a deployed artifact in place: rel-L2 per
    field, plus served-band coverage on ensemble artifacts — preset
    defaults to the artifact's own experiment."""
    import json as _json

    from pinns_tpu.cli import main as cli_main
    from pinns_tpu.parallel.ensemble import init_ensemble_states, uq_calibration
    from pinns_tpu.serve import export_ensemble, export_predict

    tr, state = _trained("abgrall_l2")
    point = export_predict(tr, state.params, str(tmp_path / "point"))
    rc = cli_main(["eval", "--artifact", point,
                   "--set", "model.layers=(2,12,12,1)"])
    assert rc == 0
    row = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    want = tr.evaluate(state)
    np.testing.assert_allclose(row["rel_l2_u"], want["rel_l2_u"], rtol=1e-4)
    assert "band_cov_u" not in row  # point artifact has no band

    stacked = init_ensemble_states(tr, seeds=[0, 1])
    cal = uq_calibration(tr, stacked)
    ens = export_ensemble(tr, stacked.params, str(tmp_path / "ens"),
                          calibration=cal)
    rc = cli_main(["eval", "--artifact", ens,
                   "--set", "model.layers=(2,12,12,1)"])
    assert rc == 0
    row = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert row["band_k_u"] == pytest.approx(cal["u"]["k_conf95"], rel=1e-3)
    # same grid the factor was conformalized on -> coverage ~= target
    assert row["band_cov_u"] == pytest.approx(cal["u"]["cov_conf95"], abs=0.02)


def test_cli_eval_needs_a_source():
    from pinns_tpu.cli import main as cli_main

    with pytest.raises(SystemExit):
        cli_main(["eval", "--preset", "abgrall_l2"])
    with pytest.raises(SystemExit):
        cli_main(["eval", "--checkpoint", "x.ckpt"])  # no preset


def test_http_binary_npy_request_npz_response(tmp_path):
    """POST /predict with Content-Type: application/x-npy (raw .npy body)
    returns an .npz whose arrays match the JSON path bit-for-bit — the
    serving encoding that removes the JSON float-list tax (38x device-side
    at a 1M batch, PARITY §4r). Bands ride the query string; empty batches
    and garbage bytes get a JSON 400."""
    import io
    import threading
    import urllib.error
    import urllib.request

    from pinns_tpu.serve import make_http_server

    tr, state = _trained("abgrall_l2")
    path = export_predict(tr, state.params, str(tmp_path / "m"))
    server = make_http_server(path, port=0)
    host, port = server.server_address[:2]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://{host}:{port}/predict"
    try:
        x = np.asarray(tr.problem.dataset.X_star[:13], np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        req = urllib.request.Request(
            url, data=buf.getvalue(),
            headers={"Content-Type": "application/x-npy"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            assert r.headers["Content-Type"] == "application/x-npz"
            out = dict(np.load(io.BytesIO(r.read())))
        want = load_exported(path).predict(x)
        assert set(out) == set(want)
        np.testing.assert_allclose(out["u"], np.asarray(want["u"], np.float32),
                                   rtol=1e-6, atol=1e-7)

        # empty batch -> explicit 400, not an opaque XLA error
        ebuf = io.BytesIO()
        np.save(ebuf, np.zeros((0, 2), np.float32))
        for payload, ctype in [
            (ebuf.getvalue(), "application/x-npy"),
            (b'{"x": []}', "application/json"),
            (b"not numpy", "application/x-npy"),
        ]:
            bad = urllib.request.Request(
                url, data=payload, headers={"Content-Type": ctype})
            try:
                urllib.request.urlopen(bad, timeout=30)
                raise AssertionError(f"{ctype} bad payload must 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        server.shutdown()


def test_http_binary_bands_via_query(tmp_path):
    """Binary /predict?bands=1 returns the calibrated per-point half-width
    matching the JSON bands path on a calibrated ensemble artifact."""
    import io
    import json as _json
    import threading
    import urllib.request

    from pinns_tpu.parallel.ensemble import init_ensemble_states, uq_calibration
    from pinns_tpu.serve import export_ensemble, make_http_server

    tr, _ = _trained("abgrall_l2")
    stacked = init_ensemble_states(tr, seeds=[0, 1])
    cal = uq_calibration(tr, stacked)
    path = export_ensemble(tr, stacked.params, str(tmp_path / "ens"),
                           calibration=cal)
    server = make_http_server(path, port=0)
    host, port = server.server_address[:2]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        x = np.asarray(tr.problem.dataset.X_star[:9], np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        req = urllib.request.Request(
            f"http://{host}:{port}/predict?bands=1", data=buf.getvalue(),
            headers={"Content-Type": "application/x-npy"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = dict(np.load(io.BytesIO(r.read())))
        jreq = urllib.request.Request(
            f"http://{host}:{port}/predict",
            data=_json.dumps({"x": x.tolist(), "bands": True}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(jreq, timeout=120) as r:
            jout = _json.loads(r.read())
        np.testing.assert_allclose(
            out["u_band"], np.asarray(jout["u_band"], np.float32),
            rtol=1e-6, atol=1e-7)
    finally:
        server.shutdown()


def test_served_model_rejects_empty_batch(tmp_path):
    tr, state = _trained("abgrall_l2")
    served = load_exported(export_predict(tr, state.params,
                                          str(tmp_path / "m")))
    with pytest.raises(ValueError, match="empty batch"):
        served.predict(np.zeros((0, 2), np.float32), pad_to_bucket=True)


def test_cli_export_select_member(tmp_path, capsys):
    """`export --select {score,consensus}` is the shipped truth-free
    selection workflow (the principled replacement for the reference's
    pick-by-eye over per-run CSVs, Abgrall_ADMM.py:311-319): it ranks the
    member checkpoints without ground truth, exports the chosen member as
    a solo artifact, and audits the choice in the artifact meta."""
    import json as _json

    from pinns_tpu.cli import main as cli_main

    out_dir = str(tmp_path)
    small = [
        "--set", "model.layers=(2,12,12,1)", "--set", "sampling.n_f=128",
        "--set", "train.chunk=50",
    ]
    rc = cli_main(
        ["train", "--preset", "abgrall_l2", *small, "--epochs", "100",
         "--ensemble", "3", "--out-dir", out_dir]
    )
    assert rc == 0
    capsys.readouterr()
    ckpts = [
        os.path.join(out_dir, f"abgrall_l2_final_m{i}.ckpt") for i in range(3)
    ]

    for by, extra in (("score", []), ("consensus", ["--anchor", *ckpts]),
                      ("rank", [])):
        art = os.path.join(out_dir, f"sel_{by}")
        rc = cli_main(
            ["export", "--preset", "abgrall_l2", *small,
             "--checkpoint", *ckpts, "--select", by, *extra, "--out", art]
        )
        assert rc == 0
        lines = capsys.readouterr().out.strip().splitlines()
        row = _json.loads(lines[0])
        assert row["by"] == by and 0 <= row["selected"] < 3
        assert len(row["scores"]) == 3
        if by == "consensus":
            assert all("consensus" in s for s in row["scores"])
        served = load_exported(lines[-1])
        # solo artifact (no ensemble std), selection audited in meta
        assert "u_std" not in served.fields
        sel = served.meta["selection"]
        assert sel["by"] == by and sel["selected"] == row["selected"]
        # the artifact really is the selected member: its prediction
        # matches that member's checkpoint loaded through the trainer
        from pinns_tpu.config import override as _ov
        from pinns_tpu.experiments import get_preset as _gp
        from pinns_tpu.train import Trainer as _Tr

        tr = _Tr(_ov(_gp("abgrall_l2"), {
            "model.layers": (2, 12, 12, 1), "sampling.n_f": 128,
            "train.chunk": 50,
        }))
        member = tr.load_checkpoint(ckpts[row["selected"]])
        x = np.asarray(tr.problem.dataset.X_star[:17], np.float32)
        np.testing.assert_allclose(
            served.predict(x)["u"], tr.predict(member.params, x)["u"],
            rtol=2e-5, atol=1e-6,
        )

    # guard rails: --select + --calibrate and single-checkpoint both refuse
    with pytest.raises(SystemExit):
        cli_main(["export", "--preset", "abgrall_l2", *small,
                  "--checkpoint", *ckpts, "--select", "score",
                  "--calibrate", "--out", os.path.join(out_dir, "x1")])
    with pytest.raises(SystemExit):
        cli_main(["export", "--preset", "abgrall_l2", *small,
                  "--checkpoint", ckpts[0], "--select", "score",
                  "--out", os.path.join(out_dir, "x2")])
