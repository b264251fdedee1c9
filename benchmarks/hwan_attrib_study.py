#!/usr/bin/env python
"""Attribute the hwan_l2 0.078 floor (VERDICT-r4 #4, PARITY §4q).

`hwan_l2` + identified dissipation lambda2=4.8e-3 floors at rel-L2 0.0784
(r4_abgrall_visc.jsonl `hl2_visc`) while `abgrall_visc` on the same data
reaches 0.0119. PARITY §4q blamed "its l2_norm/fixed-colloc formulation" —
two CONFOUNDED reference design choices
(`Hwan_L2Regularization_Burgers.py:68-69` unsquared-norm data loss vs
`:183-184` fixed anchored LHS collocation set). These cells flip each knob
separately at lambda2=4.8e-3, everything else held at the hwan_l2 config
(narrow 8x20 net, n_f=10_000, 100k Adam):

  mse_fixed     data_kind='mse_sum',  strategy fixed_lhs_anchored
  l2norm_resamp data_kind='l2_norm',  strategy resample_uniform
  mse_resamp    both flipped (the abgrall_visc formulation on hwan's net)

Known corners: l2norm_fixed = 0.0784 (hl2_visc), wide-net mse_resamp =
0.0119 (abgrall_visc). Writes benchmarks/results/r5_hwan_attrib.jsonl.
"""

import json
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

OUT = "benchmarks/results/r5_hwan_attrib.jsonl"

CELLS = [
    ("mse_fixed", {"loss.data_kind": "mse_sum"}),
    ("l2norm_resamp", {"sampling.strategy": "resample_uniform"}),
    ("mse_resamp", {"loss.data_kind": "mse_sum",
                    "sampling.strategy": "resample_uniform"}),
]


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    for tag, ov in CELLS:
        exp = override(get_preset("hwan_l2"), {
            "pde.lambda2": 4.8e-3, "train.log_every": 0,
            # stop_tol would stop early on the easier objectives; disable so
            # every cell runs the same 100k budget as hl2_visc
            "train.stop_tol": 0.0,
            **ov,
        })
        t0 = time.time()
        _, s = Trainer(exp).train()
        emit({
            "tag": tag,
            "wall_s": round(time.time() - t0, 1),
            **{k: round(float(v), 5) for k, v in s.items() if "rel_l2" in k},
        })
