#!/usr/bin/env python
"""Euler mixed-formulation study (round 2, follow-up to flux6_study).

The measured frontier (PARITY §4j) splits by equation: rho converges best
under the strong form (ADMM 0.060), u/E under the weak form (euler_weak
0.148/0.040). flux6 added dissipation matching (identified nu ~ 2e-3 from
interior data, rho/u/E 0.012/0.028/0.010 in identification mode — the
trunk CAN represent the solution). This study mixes the forms per equation
via loss.strong_equations: selected equations evaluate the strong
pointwise residual at the same points while the rest stay weak cell means.

Part A: 200k scouts on euler_weak (+ best frozen nu from flux6 Part B).
Part B: winners at the 1M envelope.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site \
    python benchmarks/flux7_study.py [nu] [part]
"""

import json
import sys
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

NU = float(sys.argv[1]) if len(sys.argv) > 1 else 2e-3
PART = sys.argv[2] if len(sys.argv) > 2 else "A"

# (tag, overrides, epochs) on euler_weak
PART_A = [
    # mass equation strong, momentum/energy weak (the frontier split)
    ("mix_mass", {"loss.strong_equations": (0,)}, 200_000),
    # mass+energy strong (both IC/BC-pinned fields), momentum weak
    ("mix_mass_energy", {"loss.strong_equations": (0, 2)}, 200_000),
    # control: pure weak at the same nu (flux6 Part B re-check at 200k)
    ("pure_weak", {}, 200_000),
]

PART_B = [
    # seed robustness of the Part A winner at the 200k budget
    ("mix_mass_s7", {"loss.strong_equations": (0,), "train.seed": 7},
     200_000),
    ("mix_mass_s99", {"loss.strong_equations": (0,), "train.seed": 99},
     200_000),
    # 1M envelope: does longer training help or drift?
    ("mix_mass_1M", {"loss.strong_equations": (0,)}, 1_000_000),
    ("pure_weak_1M", {}, 1_000_000),
]


def run(tag, overrides, epochs):
    base = {
        "pde.lambda2": NU,
        "train.epochs": epochs,
        "train.chunk": 250,
        "train.log_every": 0,
        "optimizer.schedule_epochs": epochs,
    }
    base.update(overrides)
    exp = override(get_preset("euler_weak"), base)
    t0 = time.time()
    state, s = Trainer(exp).train()
    rec = {
        "tag": tag,
        "nu": NU,
        "epochs": epochs,
        "wall_s": round(time.time() - t0, 1),
        **{k: round(v, 4) for k, v in s.items() if k.startswith("rel_l2")},
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    runs = PART_A if PART == "A" else PART_B
    print(f"# flux7 mixed-formulation study, nu={NU}, part {PART}",
          flush=True)
    for tag, ov, ep in runs:
        run(tag, ov, ep)


if __name__ == "__main__":
    main()
