"""Model export for serving: ahead-of-time compiled prediction artifacts.

The reference has no deployment story — predictions exist only inside the
training process (``Abgrall_ADMM.py`` ``predict``/``run_NN`` print-and-CSV).
Here the trained model exports to a self-contained StableHLO artifact
(``jax.export``): the weights are baked in as constants, the batch dimension
is symbolic (serve any N), and loading needs only jax — no Experiment
config, dataset, or framework code. The artifact is hardware-portable the
way XLA programs are: the same file serves on TPU, GPU, or CPU backends.

Format: ``<path>`` is a directory with ``model.shlo`` (serialized exported
function) and ``meta.json`` (field names, input spec, experiment name,
framework version).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

_META_NAME = "meta.json"
_BLOB_NAME = "model.shlo"

# Lower for every mainstream backend at export time: jax.export otherwise
# bakes in ONLY the exporting process's platform, and a TPU-trained artifact
# then refuses to load on CPU (caught live by benchmarks/uq_export_study.py:
# "exported for platforms '('tpu',)' but used on '('cpu',)'").
_EXPORT_PLATFORMS = ("cpu", "tpu", "cuda")


def _provenance(trainer) -> dict:
    """Rollout-audit block baked into every artifact's meta.json: what
    produced this model (full config snapshot), with what framework, where,
    and when — so a served artifact is traceable without the training run's
    logs. ``default=str`` at dump time keeps exotic config values JSON-safe."""
    import dataclasses
    import time

    from pinns_tpu import __version__

    return {
        "framework": f"pinns_tpu {__version__}",
        "exported_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "export_backend": str(jax.devices()[0]),
        "config": dataclasses.asdict(trainer.exp),
    }


def export_predict(trainer, params=None, path: str = "exported_model") -> str:
    """Export the trainer's full prediction function (fields + residuals) as
    a serving artifact with the given params (default: freshly initialized —
    pass ``state.params`` from a trained state, or ``trainer.swa_params``).

    The batch dimension is exported symbolically, so the served function
    accepts any number of query points.
    """
    from pinns_tpu.train.evaluate import predict_fields

    problem = trainer.problem
    if params is None:
        params = trainer.init_state().params
    # move params out of any sharded layout; they serialize as constants
    params = jax.tree_util.tree_map(np.asarray, params)

    def fn(x):
        return predict_fields(problem, params, x)

    (b,) = jax_export.symbolic_shape("b")
    x_spec = jax.ShapeDtypeStruct((b, 2), problem.spec.dtype)
    exported = jax_export.export(jax.jit(fn), platforms=_EXPORT_PLATFORMS)(x_spec)
    blob = exported.serialize()

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _BLOB_NAME), "wb") as f:
        f.write(blob)
    # a probe call recovers the output names; exported.out_tree is jax-internal
    probe = jax.eval_shape(fn, jax.ShapeDtypeStruct((2, 2), problem.spec.dtype))
    meta = {
        "experiment": trainer.exp.name,
        "fields": sorted(probe.keys()),
        "input": {"shape": ["b", 2], "dtype": np.dtype(problem.spec.dtype).name},
        "pde": trainer.exp.pde.kind,
        "provenance": _provenance(trainer),
    }
    with open(os.path.join(path, _META_NAME), "w") as f:
        json.dump(meta, f, indent=1, default=str)
    return path


def export_ensemble(trainer, stacked_params, path: str = "exported_ensemble",
                    calibration: Optional[dict] = None) -> str:
    """Export a deep-ensemble UQ predictor: one artifact whose outputs are
    per-field ``{name}`` (ensemble mean) and ``{name}_std`` over the stacked
    member axis. Serving uncertainty costs one call, like the point model.

    ``calibration``: optional :func:`pinns_tpu.parallel.ensemble.uq_calibration`
    output. Its per-field conformal factors are stored in ``meta.json`` under
    ``calibration`` (and thus exposed by the HTTP ``/meta`` endpoint), so a
    serving client can widen the exported std into honest ~95% bands —
    mean ± k_conf95·std — without any framework code. Raw ensemble σ is
    measured ~8-10× overconfident at fronts on this suite (PARITY §4n).
    Mondrian std-binned factors (``mond_edges``/``mond_k``) ride along when
    the calibration carries them — :meth:`ServedModel.band_ks` serves the
    per-point factors that keep ~95% coverage conditional on the predicted
    std bin (the front fix).
    """
    import jax.numpy as jnp

    from pinns_tpu.train.evaluate import predict_field_dx, predict_fields

    problem = trainer.problem
    stacked_params = jax.tree_util.tree_map(np.asarray, stacked_params)
    # front-aware Mondrian calibration bins on predicted |dx| — the artifact
    # must then compute that same feature at serving time, so it gains a
    # `{name}_dx` output per calibrated field (one extra Taylor-1 pass)
    want_dx = bool(calibration) and any(
        row.get("mond_feature") == "dx" for row in calibration.values()
    )

    def fn(x):
        preds = jax.vmap(lambda p: predict_fields(problem, p, x))(
            stacked_params
        )
        out = {}
        for name, stack in preds.items():
            s32 = stack.astype(jnp.float32)
            out[name] = jnp.mean(s32, axis=0)
            out[f"{name}_std"] = jnp.std(s32, axis=0)
        if want_dx:
            dxs = jax.vmap(lambda p: predict_field_dx(problem, p, x))(
                stacked_params
            )
            for name, stack in dxs.items():
                out[f"{name}_dx"] = jnp.abs(
                    jnp.mean(stack.astype(jnp.float32), axis=0)
                )
        return out

    (b,) = jax_export.symbolic_shape("b")
    x_spec = jax.ShapeDtypeStruct((b, 2), problem.spec.dtype)
    exported = jax_export.export(jax.jit(fn), platforms=_EXPORT_PLATFORMS)(x_spec)

    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _BLOB_NAME), "wb") as f:
        f.write(exported.serialize())
    probe = jax.eval_shape(fn, jax.ShapeDtypeStruct((2, 2), problem.spec.dtype))
    n_members = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    meta = {
        "experiment": trainer.exp.name,
        "fields": sorted(probe.keys()),
        "input": {"shape": ["b", 2], "dtype": np.dtype(problem.spec.dtype).name},
        "pde": trainer.exp.pde.kind,
        "ensemble_members": int(n_members),
        "provenance": _provenance(trainer),
    }
    if calibration:
        keep = ("k_conf95", "cov_conf95", "cov2s", "k95",
                "mond_edges", "mond_k", "cov_mond95", "cov_mond95_shock")
        meta["calibration"] = {
            f: {
                **{
                    k: ([float(v) for v in row[k]]
                        if isinstance(row[k], list) else float(row[k]))
                    for k in keep if k in row
                },
                **({"mond_feature": row["mond_feature"]}
                   if "mond_feature" in row else {}),
            }
            for f, row in calibration.items()
        }
    with open(os.path.join(path, _META_NAME), "w") as f:
        json.dump(meta, f, indent=1, default=str)
    return path


class ServedModel:
    """A loaded export: ``predict(x) -> {field: (N, 1) np.ndarray}``.

    Needs only jax + the artifact directory; runs on whatever backend jax
    has (the export carries no device placement).
    """

    def __init__(self, path: str):
        with open(os.path.join(path, _META_NAME)) as f:
            self.meta = json.load(f)
        with open(os.path.join(path, _BLOB_NAME), "rb") as f:
            self._exported = jax_export.deserialize(f.read())
        self._call = jax.jit(self._exported.call)

    @property
    def fields(self):
        return self.meta["fields"]

    @staticmethod
    def bucket_size(n: int, floor: int = 64) -> int:
        """Padded batch size: `floor` for small requests, else the next
        power of two — so a server seeing arbitrary request sizes compiles
        at most ~log2(max_n) programs instead of one per distinct size."""
        if n <= floor:
            return floor
        return 1 << (n - 1).bit_length()

    def predict(self, x, pad_to_bucket: bool = False) -> Dict[str, np.ndarray]:
        # resolve via jnp: extended dtypes like 'bfloat16' are ml_dtypes
        # types that plain np.dtype(...) cannot look up by string
        dtype = jnp.dtype(self.meta["input"]["dtype"])
        x = np.asarray(jnp.asarray(np.asarray(x), dtype))
        n = x.shape[0]
        if n == 0:
            # an empty batch would pad from a nonexistent last row and can
            # fail the symbolic-dim constraint with an opaque XLA error
            raise ValueError("empty batch: x must have at least one row")
        if pad_to_bucket:
            # every output is pointwise in the batch row, so padding with a
            # repeated row and slicing back is exact for the real rows
            b = self.bucket_size(n)
            if b != n:
                pad = np.repeat(x[-1:], b - n, axis=0)
                x = np.concatenate([x, pad], axis=0)
        out = self._call(x)
        return {k: np.asarray(v)[:n] for k, v in out.items()}

    def band_k(self, field: str, default: float = 2.0) -> float:
        """Calibrated band factor for ``mean ± k·std`` on an ensemble
        artifact exported with ``calibration=`` (conformal ``k_conf95``,
        honest ~95% coverage); ``default`` when the artifact carries none."""
        cal = self.meta.get("calibration") or {}
        return float(cal.get(field, {}).get("k_conf95", default))

    def band_ks(self, field: str, std, default: float = 2.0,
                feature=None) -> np.ndarray:
        """Per-point band factors for ``mean ± k·std``: the Mondrian
        conformal factors when the artifact carries them — each served
        point is binned by its own value of the baked ``mond_feature``
        (``np.searchsorted`` over the baked ``mond_edges``): predicted std
        by default, or the predicted front proxy |d(field)/dx| (the
        artifact's ``{field}_dx`` output) for front-aware calibrations,
        passed as ``feature``. Binned factors restore near-95% coverage at
        fronts where the global factor under-covers (PARITY §4n); without
        baked bins this returns a constant array of :meth:`band_k`. A
        'dx'-calibrated artifact with no feature given falls back to the
        global factor rather than silently binning on the wrong feature."""
        cal = (self.meta.get("calibration") or {}).get(field, {})
        edges, mond_k = cal.get("mond_edges"), cal.get("mond_k")
        std = np.asarray(std, np.float64)
        if not edges or not mond_k:
            return np.full(std.shape, self.band_k(field, default))
        needs_dx = cal.get("mond_feature", "std") == "dx"
        if needs_dx and feature is None:
            return np.full(std.shape, self.band_k(field, default))
        feat = (np.asarray(feature, np.float64) if needs_dx else std)
        idx = np.searchsorted(np.asarray(edges, np.float64), feat,
                              side="right")
        return np.asarray(mond_k, np.float64)[idx]


def load_exported(path: str) -> ServedModel:
    return ServedModel(path)


def make_http_server(path: str, host: str = "127.0.0.1", port: int = 8080):
    """Minimal stdlib JSON prediction server over an exported artifact.

    Endpoints:
      GET  /meta     -> the artifact's meta.json
      POST /predict  -> body {"x": [[x, t], ...]} returns
                        {field: [[...], ...]} for every exported field
                        (for ensemble artifacts that includes `{name}_std`).
                        With {"x": ..., "bands": true} on a calibrated
                        ensemble artifact, also returns `{name}_band`: the
                        per-point calibrated ~95% half-width
                        (band_ks(name, std) * std — Mondrian factors when
                        baked, else the global k_conf95). Only fields with
                        baked calibration get a band; an artifact exported
                        without --calibrate gets a 400, never a silent
                        2.0*std band.

    Binary payloads (the JSON float-list encoding dominates served latency
    above ~64k points — 38x device-side at a 1M batch, PARITY §4r; no
    reference analog, this is the framework's own deployment path):
      POST /predict with Content-Type: application/x-npy and a raw .npy
      (N, 2) float array body returns Content-Type: application/x-npz — an
      .npz with one float32 array per exported field (np.load(BytesIO(body))
      client-side). Bands via the query string: /predict?bands=1. Errors
      are always JSON with a diagnostic, whatever the request encoding.

    Returns the (unstarted) ThreadingHTTPServer; callers run
    ``server.serve_forever()`` (the CLI does) or drive it from a thread in
    tests. Batch dim is symbolic in the artifact, so any request size
    works; requests are padded to power-of-two size buckets
    (``ServedModel.bucket_size``) before the exported call, so N distinct
    request sizes cost at most ~log2(max_n) XLA compiles — not N programs
    cached forever in-process. The first request IN a new bucket pays that
    bucket's one compile."""
    import http.server
    import io
    import urllib.parse

    served = ServedModel(path)

    class Handler(http.server.BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_npz(self, out: Dict[str, np.ndarray]):
            buf = io.BytesIO()
            np.savez(buf, **{k: np.asarray(v, np.float32)
                             for k, v in out.items()})
            body = buf.getvalue()
            self.send_response(200)
            self.send_header("Content-Type", "application/x-npz")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/meta":
                self._send(200, served.meta)
            else:
                self._send(404, {"error": "unknown path; use /meta or POST /predict"})

        def do_POST(self):
            url = urllib.parse.urlsplit(self.path)
            if url.path != "/predict":
                self._send(404, {"error": "unknown path; use POST /predict"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                ctype = (self.headers.get("Content-Type")
                         or "application/json").split(";")[0].strip()
                binary = ctype in ("application/x-npy",
                                   "application/octet-stream")
                body = self.rfile.read(n)
                if binary:
                    x = np.load(io.BytesIO(body), allow_pickle=False)
                    query = urllib.parse.parse_qs(url.query)
                    want_bands = query.get("bands", ["0"])[0] not in (
                        "0", "", "false")
                else:
                    req = json.loads(body)
                    x = np.asarray(req["x"], np.float32)
                    want_bands = bool(req.get("bands"))
                x = np.asarray(x, np.float32)
                if x.ndim != 2 or x.shape[1] != 2:
                    raise ValueError(f"x must be (N, 2), got {x.shape}")
                if x.shape[0] == 0:
                    raise ValueError("empty batch: x must have >= 1 row")
                out = served.predict(x, pad_to_bucket=True)
                if want_bands:
                    # only fields with BAKED factors get a band: serving
                    # 2.0*std as a "~95% band" would be silently ~10x
                    # overconfident at fronts (PARITY 4n)
                    cal = served.meta.get("calibration") or {}
                    if not cal:
                        raise ValueError(
                            "artifact carries no calibration metadata; "
                            "export with --calibrate to serve bands"
                        )
                    for k in list(out):
                        if k.endswith("_std"):
                            name = k[: -len("_std")]
                            if name not in cal:
                                continue
                            ks = served.band_ks(
                                name, out[k],
                                feature=out.get(f"{name}_dx"),
                            )
                            out[f"{name}_band"] = ks * np.asarray(
                                out[k], np.float64
                            )
                if binary:
                    self._send_npz(out)
                else:
                    self._send(
                        200,
                        {k: np.asarray(v, np.float32).tolist()
                         for k, v in out.items()},
                    )
            except Exception as e:  # malformed request -> diagnostic, not a crash
                self._send(400, {"error": str(e)})

        def log_message(self, *a):  # quiet by default
            pass

    return http.server.ThreadingHTTPServer((host, port), Handler)
