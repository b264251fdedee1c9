#!/usr/bin/env python
"""TPU->CPU export round-trip re-drive (round 3, after the serve.py fix).

The first uq_export_study run on the chip caught a real bug: jax.export
bakes in only the exporting platform, so TPU-exported artifacts raised
"exported for platforms '('tpu',)' but used on '('cpu',)'" at CPU load.
serve.py now exports with platforms=("cpu","tpu","cuda"); this script
re-drives exactly the failing leg — export solo + ensemble artifacts ON the
TPU backend, reload them in a clean CPU subprocess, compare pointwise —
WITHOUT retraining (round-trip parity does not depend on weight quality;
a short 2k-epoch train supplies non-degenerate weights).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/export_roundtrip_tpu.py
Appends to benchmarks/results/r3_uq_export.jsonl (tags *_fixed).
"""

import os
import time

import numpy as np

# run as `python benchmarks/export_roundtrip_tpu.py`: sys.path[0] is
# benchmarks/, so the sibling study module imports directly
from uq_export_study import ART, cpu_roundtrip, emit
from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.parallel.ensemble import (
    ensemble_predict,
    run_ensemble,
    unstack_states,
)
from pinns_tpu.serve import export_ensemble, export_predict
from pinns_tpu.train import Trainer


def main():
    exp = override(
        get_preset("twosin_weak"),
        {"train.epochs": 2000, "train.chunk": 500, "train.log_every": 0},
    )
    tr = Trainer(exp)
    t0 = time.time()
    stacked, _ = run_ensemble(tr, [1234, 1235])
    emit({"tag": "fixed_train", "wall_s": round(time.time() - t0, 1)})

    os.makedirs(ART, exist_ok=True)
    probe_x = np.asarray(tr.problem.dataset.X_star[:257], np.float32)

    solo_state = unstack_states(stacked, 2)[0]
    solo_path = export_predict(
        tr, solo_state.params, os.path.join(ART, "fixed_solo")
    )
    solo_preds = tr.predict(solo_state.params, probe_x)
    cpu_roundtrip(solo_path, probe_x, solo_preds, "fixed_solo")

    ens_path = export_ensemble(
        tr, stacked.params, os.path.join(ART, "fixed_ens")
    )
    ens_tpu = ensemble_predict(tr, stacked, probe_x)
    flat = {}
    for fname, p in ens_tpu.items():
        flat[fname] = p["mean"]
        flat[f"{fname}_std"] = p["std"]
    cpu_roundtrip(ens_path, probe_x, flat, "fixed_ens")


if __name__ == "__main__":
    main()
