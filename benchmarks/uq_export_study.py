#!/usr/bin/env python
"""UQ calibration + serving-export round-trip on the chip (VERDICT r2 #7).

Trains the two shipped-recipe 8-seed ensembles on the TPU, then:
  1. measures deep-ensemble coverage calibration (uq_calibration: fraction
     of grid points with |error| <= k*std, overall and in the
     steepest-gradient decile — the shock/contact);
  2. exports the solo + ensemble StableHLO artifacts ON the TPU backend and
     re-loads them in a CPU SUBPROCESS, checking prediction parity — the
     cross-backend claim of serve.py, driven for real.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/uq_export_study.py [twosin|euler]
Writes benchmarks/results/r3_uq_export.jsonl.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.parallel.ensemble import (
    ensemble_predict,
    run_ensemble,
    uq_calibration,
)
from pinns_tpu.serve import export_ensemble, export_predict
from pinns_tpu.train import Trainer

OUT = "benchmarks/results/r3_uq_export.jsonl"
ART = "benchmarks/results/r3_artifacts"

CASES = {
    "twosin": ("twosin_weak", {}),
    "euler": (
        "euler_weak_fast",
        {},
    ),
}

_CPU_CHECK = """
import json, sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
from pinns_tpu.serve import load_exported
path, probe_path = sys.argv[1], sys.argv[2]
probe = np.load(probe_path)
served = load_exported(path)
got = served.predict(probe["x"])
out = {}
for k in served.fields:
    want = probe[k]
    got_k = np.asarray(got[k], np.float32)
    out[k] = float(np.max(np.abs(got_k - want)))
print("CPU_PARITY " + json.dumps(out))
"""


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _round4(v):
    if isinstance(v, list):
        return [round(float(x), 4) for x in v]
    return round(float(v), 4)


def cpu_roundtrip(path, probe_x, tpu_preds, tag):
    """Reload a TPU-exported artifact on CPU in a clean subprocess and
    compare predictions pointwise against the TPU-side values."""
    probe_path = os.path.join(path, "probe.npz")
    np.savez(probe_path, x=probe_x,
             **{k: np.asarray(v, np.float32) for k, v in tpu_preds.items()})
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r = subprocess.run(
        [sys.executable, "-c", _CPU_CHECK, path, probe_path],
        capture_output=True, text=True, timeout=600, env=env,
    )
    line = next(
        (ln for ln in r.stdout.splitlines() if ln.startswith("CPU_PARITY")),
        None,
    )
    if line is None:
        emit({"tag": f"{tag}_cpu_roundtrip", "error": r.stderr[-500:]})
        return
    diffs = json.loads(line[len("CPU_PARITY "):])

    def tol(field):
        # Residual diagnostics (f, f1..f3) are 2nd derivatives through the
        # tanh trunk — cross-backend last-ulp differences amplify there
        # (measured ≤8.5e-3 TPU→CPU, PARITY §4n). Primary fields and std
        # bands: ≤1.5e-4 on converged runs, up to 4.2e-4 on the toy
        # 200-epoch cells (r3_uq_export.jsonl fixed_solo) — 1e-3 keeps
        # ~2.4x headroom over the worst measured-good value while still
        # catching a real parity regression.
        return 5e-2 if field.split("_")[0].startswith("f") else 1e-3

    emit({"tag": f"{tag}_cpu_roundtrip", "max_abs_diff": diffs,
          "ok": all(v < tol(k) for k, v in diffs.items())})


def run_case(tag):
    preset, ov = CASES[tag]
    base = {"train.log_every": 0}
    base.update(ov)
    exp = override(get_preset(preset), base)
    tr = Trainer(exp)
    seeds = [exp.train.seed + i for i in range(8)]
    t0 = time.time()
    stacked, summaries = run_ensemble(tr, seeds)
    wall = round(time.time() - t0, 1)
    emit({
        "tag": f"{tag}_ens8", "wall_s": wall,
        "members": [
            {k: round(float(v), 4) for k, v in s.items() if "rel_l2" in k}
            for s in summaries
        ],
    })

    cal = uq_calibration(tr, stacked)
    emit({"tag": f"{tag}_calibration", **{
        f: {k: _round4(v) for k, v in row.items()} for f, row in cal.items()
    }})

    # export ON the TPU backend; parity-check in a CPU subprocess
    os.makedirs(ART, exist_ok=True)
    probe_x = np.asarray(tr.problem.dataset.X_star[:257], np.float32)

    from pinns_tpu.parallel.ensemble import unstack_states

    solo_state = unstack_states(stacked, len(seeds))[0]
    solo_path = export_predict(tr, solo_state.params,
                               os.path.join(ART, f"{tag}_solo"))
    solo_preds = tr.predict(solo_state.params, probe_x)
    cpu_roundtrip(solo_path, probe_x, solo_preds, f"{tag}_solo")

    ens_path = export_ensemble(tr, stacked.params,
                               os.path.join(ART, f"{tag}_ens"),
                               calibration=cal)
    ens_tpu = ensemble_predict(tr, stacked, probe_x)
    flat = {}
    for fname, p in ens_tpu.items():  # artifact fields: {name}=mean, {name}_std
        flat[fname] = p["mean"]
        flat[f"{fname}_std"] = p["std"]
    cpu_roundtrip(ens_path, probe_x, flat, f"{tag}_ens")


if __name__ == "__main__":
    args = sys.argv[1:]
    if "--toy" in args:  # CPU flush-test of the whole path at toy scale
        args.remove("--toy")
        OUT = OUT.replace(".jsonl", "_toy.jsonl")
        import jax

        jax.config.update("jax_platforms", "cpu")
        for k in CASES:
            CASES[k] = (CASES[k][0], {
                **CASES[k][1],
                "model.layers": (2, 12, 12, 1) if k == "twosin"
                else (2, 12, 12, 3),
                "sampling.n_f": 128,
                "train.epochs": 200,
                "train.chunk": 100,
                "sampling.t_curriculum_epochs": 0,
            })
    which = args or list(CASES)
    for tag in which:
        run_case(tag)
