#!/usr/bin/env python
"""SWA tail-averaging study (round 2, follow-up to flux5/flux9).

Two documented weaknesses of the shipped recipes motivate stochastic
weight averaging (Izmailov et al. 2018) over the chunk-boundary tail:

  (a) TwoSin causal runs PEAK near 200k and drift when over-trained
      (PARITY 4j: fc30 0.0745 @ 200k -> 0.118 @ 500k) — the per-step
      resample + fading causal weights make the Adam tail a noisy
      stationary process, exactly SWA's regime;
  (b) both recipes carry real seed-to-seed spread (TwoSin 0.037-0.070,
      Euler-fast u 0.063-0.077) — averaging cancels iterate noise.

SWA is host-loop-side (TrainConfig.swa_frac), so every run here reuses
the shipped presets' cached step programs.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/swa_study.py [tags]
"""

import json
import sys
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

# (tag, preset, overrides) — epochs/chunk stay at preset defaults so the
# step HLO is bit-identical to the cached programs.
RUNS = [
    # TwoSin matched recipe: both window sizes on the default seed, then
    # the better window on the other study seeds
    ("ts_swa25", "twosin_weak", {"train.swa_frac": 0.25}),
    ("ts_swa50", "twosin_weak", {"train.swa_frac": 0.5}),
    ("ts_swa25_s7", "twosin_weak", {"train.swa_frac": 0.25, "train.seed": 7}),
    ("ts_swa25_s99", "twosin_weak",
     {"train.swa_frac": 0.25, "train.seed": 99}),
    # Euler fast-budget recipe (cosine 200k, flux9)
    ("eu_fast_swa25", "euler_weak",
     {"optimizer.lr_schedule": "cosine", "train.swa_frac": 0.25,
      "train.epochs": 200_000, "optimizer.schedule_epochs": 200_000,
      "train.chunk": 250}),
    # Euler 1M envelope (constant LR, the shipped headline config)
    ("eu_1m_swa25", "euler_weak", {"train.swa_frac": 0.25}),
]

# 8-seed vmapped ensembles with SWA — one program each, same configs as the
# r2_*_ensemble8 band runs so SWA's effect on the band is directly readable
ENSEMBLE_RUNS = [
    ("ts_ens8_swa25", "twosin_weak", {"train.swa_frac": 0.25}),
    # The Euler cell doubles as the precision='highest' redo of the round-3
    # uq_export_study euler case (whose ensemble was degraded by the
    # euler_weak_fast precision='default' bug, PARITY §4o): after training
    # it also emits UQ calibration + the FIXED TPU→CPU export round-trip
    # (tags fixed_euler_*) so one chip run closes all three items.
    ("eu_ens8_swa25", "euler_weak",
     {"optimizer.lr_schedule": "cosine", "train.swa_frac": 0.25,
      "train.epochs": 200_000, "optimizer.schedule_epochs": 200_000,
      "train.chunk": 250}),
]


def uq_export_after(tr, stacked, n, tag):
    """UQ calibration + cross-backend export round-trip on a trained stack."""
    import os

    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from uq_export_study import ART, _round4, cpu_roundtrip, emit

    from pinns_tpu.parallel.ensemble import (
        ensemble_predict,
        unstack_states,
        uq_calibration,
    )
    from pinns_tpu.serve import export_ensemble, export_predict

    cal = uq_calibration(tr, stacked)
    emit({"tag": f"{tag}_calibration", **{
        f: {k: _round4(v) for k, v in row.items()} for f, row in cal.items()
    }})
    os.makedirs(ART, exist_ok=True)
    probe_x = np.asarray(tr.problem.dataset.X_star[:257], np.float32)
    solo_state = unstack_states(stacked, n)[0]
    solo_path = export_predict(tr, solo_state.params,
                               os.path.join(ART, f"{tag}_solo"))
    cpu_roundtrip(solo_path, probe_x, tr.predict(solo_state.params, probe_x),
                  f"{tag}_solo")
    ens_path = export_ensemble(tr, stacked.params,
                               os.path.join(ART, f"{tag}_ens"),
                               calibration=cal)
    ens_tpu = ensemble_predict(tr, stacked, probe_x)
    flat = {}
    for fname, p in ens_tpu.items():
        flat[fname] = p["mean"]
        flat[f"{fname}_std"] = p["std"]
    cpu_roundtrip(ens_path, probe_x, flat, f"{tag}_ens")


def run(tag, preset, overrides):
    base = {"train.log_every": 0}
    base.update(overrides)
    exp = override(get_preset(preset), base)
    t0 = time.time()
    state, s = Trainer(exp).train()
    rec = {
        "tag": tag,
        "epochs": exp.train.epochs,
        "wall_s": round(time.time() - t0, 1),
        **{k: round(float(v), 4) for k, v in s.items()
           if "rel_l2" in k or k == "swa_snapshots"},
    }
    print(json.dumps(rec), flush=True)
    return rec


def run_ens(tag, preset, overrides, n=8):
    from pinns_tpu.parallel.ensemble import run_ensemble

    base = {"train.log_every": 0}
    base.update(overrides)
    exp = override(get_preset(preset), base)
    tr = Trainer(exp)
    seeds = [exp.train.seed + i for i in range(n)]
    t0 = time.time()
    stacked, summaries = run_ensemble(tr, seeds)
    wall = round(time.time() - t0, 1)
    for i, s in enumerate(summaries):
        rec = {
            "tag": tag, "member": i, "seed": seeds[i], "wall_s": wall,
            **{k: round(float(v), 4) for k, v in s.items()
               if "rel_l2" in k},
        }
        print(json.dumps(rec), flush=True)
    if tag.startswith("eu_ens8"):
        uq_export_after(tr, stacked, n, "fixed_euler")


def main():
    only = set(sys.argv[1:])
    print("# swa tail-averaging study", flush=True)
    for tag, preset, ov in RUNS:
        if only and tag not in only:
            continue
        run(tag, preset, ov)
    for tag, preset, ov in ENSEMBLE_RUNS:
        if only and tag not in only:
            continue
        run_ens(tag, preset, ov)


if __name__ == "__main__":
    main()
