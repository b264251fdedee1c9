#!/usr/bin/env python
"""Grade an exported Euler artifact against BOTH ground truths (round 4).

The exact Riemann oracle (PARITY §2, round 4) showed the stored DG
artifact carries its own error (rho 2.3 % / u 28 % / E 2.7 % max column
rel-L2 vs the true solution). This grades a served model against each, on
CPU, answering: is the model closer to the truth than the reference's own
data is — i.e. has it hit the data floor?

Usage: PYTHONPATH=/root/repo python benchmarks/euler_exact_grade.py \
           <artifact_dir> [tag] [out.jsonl]
"""

import json
import sys

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")


def grade(served, x, t, fields):
    xs, ts = np.meshgrid(x, t, indexing="ij")
    pts = np.stack([xs.ravel(), ts.ravel()], axis=1).astype(np.float32)
    preds = served.predict(pts)
    out = {}
    for name, exact in fields.items():
        if name not in preds:
            continue
        p = np.asarray(preds[name]).reshape(exact.shape)
        out[f"rel_l2_{name}"] = round(
            float(np.linalg.norm(p - exact) / np.linalg.norm(exact)), 5
        )
    return out


def main(artifact, tag="exact_grade", out=None):
    import scipy.io

    from pinns_tpu.data.generators import make_abgrall_eulers_grid
    from pinns_tpu.serve import load_exported

    served = load_exported(artifact)
    rec = {"tag": tag, "artifact": artifact}

    ref = scipy.io.loadmat("/root/reference/Eulers/Data/Abgrall_eulers.mat")
    rec["vs_stored"] = grade(
        served, ref["x"].ravel(), ref["t"].ravel(),
        {"rho": ref["rhosol"], "u": ref["usol"], "E": ref["Enersol"]},
    )
    ex = make_abgrall_eulers_grid()
    rec["vs_exact"] = grade(
        served, ex["x"].ravel(), ex["t"].ravel(),
        {"rho": ex["rhosol"], "u": ex["usol"], "E": ex["Enersol"]},
    )
    print(json.dumps(rec))
    if out:
        with open(out, "a") as f:
            f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:4]))
