#!/usr/bin/env python
"""Euler quality study (VERDICT round-1 item #6).

The reference's Euler run (``Euler_ADMM.py:29-34``: N_data=200, N_f=1000,
pen=40, 1e5 epochs) plateaus far from the DG solution; round 1 measured
rho/u/E rel-L2 0.152/0.234/0.068 at 1M epochs. This study uses the
framework's ~1000x epoch rate to scan the levers the reference could not
afford: per-field data weights, time-marching curriculum, collocation count,
IC/BC data count, and LR schedule — each stage a few minutes on one chip.

Stage 1: short-budget scan over the lever grid (serial jit specializations —
         the axes are static).
Stage 2: rerun the best configs at the 1M-epoch envelope.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/euler_quality_study.py [stage1_epochs]
"""

import json
import sys
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

STAGE1 = [
    # (tag, overrides)
    ("reference", {}),
    ("w_rho3", {"loss.data_field_weights": (3.0, 1.0, 1.0)}),
    ("curr", {"sampling.t_curriculum_epochs": 50_000}),
    ("nf8k", {"sampling.n_f": 8192}),
    ("nu400", {"data.n_u": 400}),
    ("cosine", {
        "optimizer.lr_schedule": "cosine",
        "optimizer.schedule_epochs": 200_000,
    }),
    ("combo", {
        "loss.data_field_weights": (3.0, 1.0, 1.0),
        "sampling.t_curriculum_epochs": 50_000,
        "sampling.n_f": 8192,
        "data.n_u": 400,
        "optimizer.lr_schedule": "cosine",
        "optimizer.schedule_epochs": 200_000,
    }),
]


def run(tag, overrides, epochs):
    exp = override(
        get_preset("euler_admm"),
        dict(
            {
                "train.epochs": epochs,
                # wide 5x200 trunk: keep scanned chunks <= 250 to avoid the
                # pathological remote compile (CLAUDE.md)
                "train.chunk": 250,
                "train.log_every": 0,
                "optimizer.kind": "adam",
            },
            **overrides,
        ),
    )
    t0 = time.time()
    _, s = Trainer(exp).train()
    rec = {
        "tag": tag,
        "epochs": epochs,
        "wall_s": round(time.time() - t0, 1),
        **{k: round(v, 4) for k, v in s.items() if k.startswith("rel_l2")},
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    results = [run(tag, ov, epochs) for tag, ov in STAGE1]
    best = sorted(results, key=lambda r: r["rel_l2_rho"])[:2]
    print("STAGE2 (1M epochs) on:", [b["tag"] for b in best], flush=True)
    by_tag = dict(STAGE1)
    for b in best:
        run(b["tag"] + "_1M", by_tag[b["tag"]], 1_000_000)


if __name__ == "__main__":
    main()
