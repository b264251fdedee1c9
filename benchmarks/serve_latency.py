#!/usr/bin/env python
"""Serving-path latency/throughput for exported StableHLO artifacts.

The export/serving stack has measured *quality* evidence (TPU->CPU parity,
calibrated bands — PARITY §4n) but no measured latency/throughput. This
times the two layers a deployment cares about, per batch size:

- ``device``: the jitted exported call alone, device-resident inputs,
  CHAINED state->state (x += eps*pred so each call consumes the previous
  result — independent repeated calls under-report wildly on this relay,
  see CLAUDE.md);
- ``served``: ``ServedModel.predict`` end to end — numpy in, numpy out,
  including host<->device transfer and output dict materialization. Also
  chained (the next batch is perturbed by the previous prediction).

Artifacts measured: the solo TwoSin predictor (narrow 8x20 trunk + residual
diagnostics), the solo Euler predictor (wide 5x200, 3 fields), and the
8-member Euler UQ ensemble (mean+std serving cost). Weights are freshly
initialized — latency does not depend on weight values.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/serve_latency.py
  JAX_PLATFORMS=cpu python benchmarks/serve_latency.py   # CPU comparison
"""

import json
import os
import sys
import tempfile
import time

import numpy as np

import jax
import jax.numpy as jnp

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.parallel.ensemble import init_ensemble_states
from pinns_tpu.serve import export_ensemble, export_predict, load_exported
from pinns_tpu.train import Trainer

BATCHES = (256, 4096, 65536, 1048576)
REPS = 20
OUT = "benchmarks/results/r4_serve_latency.jsonl"
HTTP_OUT = "benchmarks/results/r5_serve_http.jsonl"


def _chained_device(model, x0, reps=REPS):
    """Per-call seconds of the raw exported call, device inputs, each
    call's input perturbed by the previous call's first output. Returns
    (cold_seconds, [warm_seconds...]) — cold includes the XLA compile."""
    call = model._call
    field = model.fields[0]
    x = jnp.asarray(x0)
    t0 = time.perf_counter()
    out = call(x)  # compile + warm
    jax.block_until_ready(out)
    cold = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = call(x)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
        x = x + 1e-7 * out[field]  # chain: next input depends on result
    return cold, times


def _chained_served(model, x0, reps=REPS):
    """Per-call seconds of ServedModel.predict (numpy end to end)."""
    field = model.fields[0]
    x = np.asarray(x0)
    out = model.predict(x)  # warm
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = model.predict(x)
        times.append(time.perf_counter() - t0)
        x = x + 1e-7 * out[field]
    return times


def _pct(times, q):
    return round(float(np.percentile(times, q)) * 1e3, 3)


def _chained_http(url, x0, field, binary, reps=REPS):
    """Per-call seconds of a real HTTP POST /predict round-trip, chained
    (next batch perturbed by the previous response). ``binary``: npy body ->
    npz response (round-5 payload, VERDICT-r4 #7) vs JSON float lists."""
    import io
    import urllib.request

    x = np.asarray(x0, np.float32)
    times = []
    out_u = None
    for i in range(reps + 1):  # first call warms the bucket
        if binary:
            buf = io.BytesIO()
            np.save(buf, x)
            req = urllib.request.Request(
                url, data=buf.getvalue(),
                headers={"Content-Type": "application/x-npy"})
        else:
            req = urllib.request.Request(
                url, data=json.dumps({"x": x.tolist()}).encode(),
                headers={"Content-Type": "application/json"})
        t0 = time.perf_counter()
        with urllib.request.urlopen(req, timeout=600) as r:
            body = r.read()
        if binary:
            out_u = np.asarray(dict(np.load(io.BytesIO(body)))[field])
        else:
            out_u = np.asarray(json.loads(body)[field], np.float32)
        if i > 0:
            times.append(time.perf_counter() - t0)
        x = x + 1e-7 * out_u
    return times


def measure_http(tag, path, batches=(65536, 1048576), reps=REPS):
    """JSON vs binary HTTP serving throughput over a live server thread."""
    import threading

    from pinns_tpu.serve import make_http_server

    server = make_http_server(path, port=0)
    host, port = server.server_address[:2]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    url = f"http://{host}:{port}/predict"
    model = load_exported(path)
    field = model.fields[0]
    rng = np.random.default_rng(0)
    try:
        for b in batches:
            x0 = rng.uniform(-0.5, 0.5, size=(b, 2)).astype(np.float32)
            _, dev = _chained_device(model, x0, reps=max(5, reps // 2))
            for binary in (False, True):
                srv = _chained_http(url, x0, field, binary, reps=reps)
                rec = {
                    "tag": tag, "batch": b,
                    "encoding": "npy" if binary else "json",
                    "backend": jax.default_backend(),
                    "n_outputs": len(model.fields),
                    "device_p50_ms": _pct(dev, 50),
                    "http_p50_ms": _pct(srv, 50),
                    "http_p99_ms": _pct(srv, 99),
                    "device_pts_per_s": int(b / np.median(dev)),
                    "http_pts_per_s": int(b / np.median(srv)),
                }
                with open(HTTP_OUT, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(json.dumps(rec), flush=True)
    finally:
        server.shutdown()


def measure(tag, path):
    model = load_exported(path)
    rng = np.random.default_rng(0)
    for b in BATCHES:
        x0 = rng.uniform(-0.5, 0.5, size=(b, 2)).astype(np.float32)
        cold, dev = _chained_device(model, x0)
        srv = _chained_served(model, x0)
        rec = {
            "tag": tag, "batch": b,
            "backend": jax.default_backend(),
            "n_outputs": len(model.fields),
            "cold_ms": round(cold * 1e3, 1),
            "device_p50_ms": _pct(dev, 50),
            "device_p99_ms": _pct(dev, 99),
            "served_p50_ms": _pct(srv, 50),
            "served_p99_ms": _pct(srv, 99),
            "device_pts_per_s": int(b / np.median(dev)),
            "served_pts_per_s": int(b / np.median(srv)),
        }
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


def _export(tag, out_root):
    if tag == "twosin_solo":
        tr = Trainer(get_preset("twosin_weak"))
        return export_predict(tr, None, os.path.join(out_root, tag))
    tre = Trainer(override(get_preset("euler_weak"), {"train.log_every": 0}))
    if tag == "euler_solo":
        return export_predict(tre, None, os.path.join(out_root, tag))
    stacked = init_ensemble_states(tre, list(range(8)))
    return export_ensemble(tre, stacked.params, os.path.join(out_root, tag))


def main():
    args = sys.argv[1:]
    http = "--http" in args
    only = set(a for a in args if not a.startswith("--"))
    out_root = tempfile.mkdtemp(prefix="serve_latency_")
    for tag in ("twosin_solo", "euler_solo", "euler_ens8"):
        if only and tag not in only:
            continue
        path = _export(tag, out_root)
        if http:
            measure_http(tag, path)
        else:
            measure(tag, path)


if __name__ == "__main__":
    main()
