#!/usr/bin/env python
"""Recompute UQ calibration from an exported ensemble artifact, on CPU.

A calibrated ensemble artifact bakes the mean/std predictor (serve.py) and
the dataset grid carries the exact fields, so `calibration_stats` can be
re-run with the CURRENT estimator without retraining the members. Used to
re-grade the round-3 ensembles with the shipped disjoint-edges Mondrian
estimator (the study process that trained them had imported the pre-fix
version); `uq_calibration` computes the same mean/std via ensemble_predict,
so the two paths grade identical inputs.

Usage: PYTHONPATH=/root/repo python benchmarks/recal_from_artifact.py \
           <artifact_dir> [tag] [out.jsonl]
"""

import json
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def main(artifact, tag="recal", out=None):
    from pinns_tpu.experiments import get_preset
    from pinns_tpu.parallel.ensemble import calibration_stats
    from pinns_tpu.serve import load_exported
    from pinns_tpu.train import Trainer

    served = load_exported(artifact)
    preset = served.meta["experiment"]
    tr = Trainer(get_preset(preset))
    ds = tr.problem.dataset
    preds = served.predict(np.asarray(ds.X_star, np.float32))
    rec = {"tag": tag, "artifact": artifact, "experiment": preset}
    for name in sorted(ds.star):
        mean, std = preds.get(name), preds.get(f"{name}_std")
        if mean is None or std is None:
            continue
        gx = np.abs(
            np.gradient(np.asarray(ds.fields[name], np.float64), axis=1)
        )
        grad_mag = np.broadcast_to(
            gx.reshape(-1, 1), np.asarray(mean).shape
        )
        row = calibration_stats(
            ds.star[name], mean, std, grad_mag=grad_mag
        )
        rec[name] = {
            k: ([round(float(x), 4) for x in v] if isinstance(v, list)
                else round(float(v), 4))
            for k, v in row.items()
        }
    print(json.dumps(rec))
    if out:
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:4]))
