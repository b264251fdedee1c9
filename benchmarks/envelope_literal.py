#!/usr/bin/env python
"""One literal 10^6-epoch envelope cell (VERDICT r2 item 6).

The reference sweep jobs run the full million-iteration loop: 50k Adam
epochs, then EVERY remaining epoch re-invokes the (already converged) SciPy
L-BFGS minimize (/root/reference/Burgers/continuous_identification/
scheduler.py:146-150, Abgrall_ADMM.py:210-217). The repo's envelope
reproduction runs 50k Adam + 100 L-BFGS outer epochs on the argument that
the converged tail is a no-op; this script PINS that claim by running one
abgrall_admm cell with the literal schedule (950k on-device L-BFGS outer
epochs, each a full inner solve that exits immediately at the converged
point) and comparing rel-L2 + params against the shortcut.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/envelope_literal.py
Writes benchmarks/results/r3_envelope_literal.jsonl.
"""

import json
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

OUT = "benchmarks/results/r3_envelope_literal.jsonl"


def run(tag, epochs):
    exp = override(
        get_preset("abgrall_admm"),
        {
            "name": f"envlit_{tag}",
            "train.epochs": epochs,
            "train.log_every": 100_000,
            "train.out_dir": "",
        },
    )
    tr = Trainer(exp)
    t0 = time.time()
    state, summary = tr.train()
    wall = time.time() - t0
    row = {
        "tag": tag,
        "epochs": epochs,
        "wall_s": round(wall, 1),
        **{k: v for k, v in summary.items() if k.startswith("rel_l2")},
    }
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)
    return state, row


if __name__ == "__main__":
    # shortcut cell first (cheap, fresh baseline under identical code)
    _, short = run("shortcut_50k_100outer", 50_100)
    # the literal schedule: 50k Adam + 950k L-BFGS outer epochs
    _, lit = run("literal_1M", 1_000_000)
    delta = abs(lit["rel_l2_u"] - short["rel_l2_u"])
    print(
        json.dumps(
            {
                "tag": "equivalence",
                "rel_l2_shortcut": short["rel_l2_u"],
                "rel_l2_literal": lit["rel_l2_u"],
                "abs_delta": delta,
            }
        )
    )
