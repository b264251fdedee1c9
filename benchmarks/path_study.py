#!/usr/bin/env python
"""Trainable shock-path feature study (round 2; follows PARITY §4c/§4d).

PARITY concluded both remaining plateaus are REPRESENTATION limits of the
smooth tanh trunk: the clock-corrected TwoSin shock (floor 0.037, best run
0.384 @ 1M plain mean-square) and the Euler u-field at the contact (~0.21
under every optimization lever, unchanged even by direct interior
supervision). model.n_paths adds the representation lever: steep-tanh
coordinate features tanh(a_k (x_n - s_k(t_n))) whose path polynomials s_k
and sharpnesses a_k TRAIN with the weights (models/mlp.py `_path_streams`).

Part A: clock-corrected TwoSin (pde.lambda1=0.377), plain mean-square
        residual (the measured best formulation, PARITY §4d), scanning
        n_paths / sharpness / degree / ADMM composition. 200k cosine Adam
        per cell; winners at 1M.
Part B: euler_admm_tuned + paths, 200k per cell; winner at 1M, ranked by
        the u-field (the plateau under attack).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/path_study.py [epochs]
"""

import json
import sys
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

TWOSIN_BASE = {
    "pde.lambda1": 0.377,
    "loss.residual_kind": "mean_sq",
    "optimizer.kind": "adam",
    "optimizer.lr_schedule": "cosine",
}

PART_A = [
    ("ms_base", {}),
    ("p1", {"model.n_paths": 1}),
    ("p2", {"model.n_paths": 2}),
    ("p4", {"model.n_paths": 4}),
    ("p2_sharp12", {"model.n_paths": 2, "model.path_sharpness": 12.0}),
    ("p2_deg3", {"model.n_paths": 2, "model.path_degree": 3}),
    ("p2_admm", {"model.n_paths": 2, "loss.residual_kind": "admm"}),
]

PART_B = [
    ("tuned_base", {}),
    ("p2", {"model.n_paths": 2}),
    ("p4", {"model.n_paths": 4}),
    ("p2_sharp12", {"model.n_paths": 2, "model.path_sharpness": 12.0}),
]


def run(preset, tag, overrides, epochs, extra_base=None):
    base = dict(extra_base or {})
    base.update({
        "train.epochs": epochs,
        "train.chunk": 250,  # wide-net remote-compile limit (CLAUDE.md)
        "train.log_every": 0,
        "optimizer.schedule_epochs": epochs,
    })
    base.update(overrides)
    exp = override(get_preset(preset), base)
    t0 = time.time()
    state, s = Trainer(exp).train()
    rec = {
        "tag": tag,
        "epochs": epochs,
        "wall_s": round(time.time() - t0, 1),
        **{k: round(v, 4) for k, v in s.items() if k.startswith("rel_l2")},
    }
    if exp.model.n_paths:
        import numpy as np

        layer0 = state.params["net"][0]
        rec["path_c"] = np.asarray(layer0["path_c"]).round(3).tolist()
        rec["path_a"] = np.asarray(layer0["path_a"]).round(2).tolist()
    print(json.dumps(rec), flush=True)
    return rec


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

    print("# Part A: clock-corrected TwoSin + shock paths", flush=True)
    res_a = [
        run("abgrall_admm", tag, ov, epochs, TWOSIN_BASE)
        for tag, ov in PART_A
    ]
    best_a = sorted(res_a, key=lambda r: r["rel_l2_u"])[:2]
    by_tag_a = dict(PART_A)
    print("# Part A winners at 1M:", [b["tag"] for b in best_a], flush=True)
    for b in best_a:
        run("abgrall_admm", b["tag"] + "_1M", by_tag_a[b["tag"]],
            1_000_000, TWOSIN_BASE)

    print("# Part B: euler_admm_tuned + paths", flush=True)
    res_b = [
        run("euler_admm_tuned", tag, ov, epochs, {"optimizer.kind": "adam"})
        for tag, ov in PART_B
    ]
    best_b = sorted(res_b, key=lambda r: r["rel_l2_u"])[:1]
    by_tag_b = dict(PART_B)
    print("# Part B winner at 1M:", [b["tag"] for b in best_b], flush=True)
    for b in best_b:
        run("euler_admm_tuned", b["tag"] + "_1M", by_tag_b[b["tag"]],
            1_000_000, {"optimizer.kind": "adam"})


if __name__ == "__main__":
    main()
