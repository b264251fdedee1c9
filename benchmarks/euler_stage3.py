#!/usr/bin/env python
"""Euler quality stage 3: targeted 1M-epoch combos of the stage-1/2 winners.

Stage 1/2 (benchmarks/euler_quality_study.py) found per-field data weighting
(rho weight 3x) is the dominant lever (rho 0.064 @ 1M vs 0.152 baseline) and
the time curriculum second; n_f=8192 / n_u=400 / plain cosine HURT at fixed
budget. This stage combines only the winning levers and attacks the stubborn
u-field plateau (~0.22) directly with a u-weighted variant.
"""

import sys

sys.path.insert(0, "/root/repo/benchmarks")
from euler_quality_study import run  # noqa: E402

STAGE3 = [
    ("w3_curr", {
        "loss.data_field_weights": (3.0, 1.0, 1.0),
        "sampling.t_curriculum_epochs": 100_000,
    }),
    ("w331", {"loss.data_field_weights": (3.0, 3.0, 1.0)}),
    ("w3_long", {"loss.data_field_weights": (3.0, 1.0, 1.0)}),
]


def main():
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    for tag, ov in STAGE3:
        e = 2 * epochs if tag.endswith("_long") else epochs
        run(tag, ov, e)


if __name__ == "__main__":
    main()
