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
    out_root = tempfile.mkdtemp(prefix="serve_latency_")
    only = set(sys.argv[1:])
    for tag in ("twosin_solo", "euler_solo", "euler_ens8"):
        if only and tag not in only:
            continue
        measure(tag, _export(tag, out_root))


if __name__ == "__main__":
    main()
