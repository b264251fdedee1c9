#!/usr/bin/env python
"""Matched dissipation on the Abgrall_burgers_shock presets (round 3).

PARITY §2's round-3 oracle identified the Abgrall dataset's effective PDE
as u_t + 0.999 u u_x = 4.8e-3 u_xx (label time physical, mild DG numerical
dissipation) — yet the three presets that train on it (`hwan_l2`,
`abgrall_l1`, `abgrall_l2`, mirroring Hwan_L2Regularization_Burgers.py:153
and Abgrall_L{1,2}.py:30 nu=0 defaults) all enforce the INVISCID residual
lambda2=0 and plateau at 0.079-0.29. Matching the identified dissipation is
exactly the lever that broke the TwoSin (0.398 -> 0.037, PARITY §4j) and
Euler (§4l) plateaus; this study applies it to the third dataset.

Cells:
  hl2_visc        hwan_l2     + lambda2=4.8e-3, 100k   (inviscid row: 0.101)
  al1_visc        abgrall_l1  + lambda2=4.8e-3, 100k   (inviscid row: 0.286)
  al2_visc        abgrall_l2  + lambda2=4.8e-3, 100k   (inviscid row: 0.235)
  al2_visc_cos200k  abgrall_l2 + lambda2, cosine 200k  (budget-scaled)
  abg_ident       burgers_inverse on abgrall data      (PINN-side check of
                  the FD-identified lambda1~1, nu~4.8e-3 from 2000 interior
                  points — the offline oracle was finite-difference LS)

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/abgrall_visc_study.py [tags]
"""

import json
import sys
import time

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

NU_ABGRALL = 4.8e-3  # identified (PARITY §2, benchmarks/abgrall_ident.py)

RUNS = [
    ("hl2_visc", "hwan_l2", {"pde.lambda2": NU_ABGRALL}, 100_000),
    ("al1_visc", "abgrall_l1", {"pde.lambda2": NU_ABGRALL}, 100_000),
    ("al2_visc", "abgrall_l2", {"pde.lambda2": NU_ABGRALL}, 100_000),
    ("al2_visc_cos200k", "abgrall_l2",
     {"pde.lambda2": NU_ABGRALL, "optimizer.lr_schedule": "cosine",
      "optimizer.schedule_epochs": 200_000}, 200_000),
    # identification: same recipe as burgers_inverse but on the Abgrall
    # grid; recovers (lambda1, nu) from interior data alone.
    ("abg_ident", "burgers_inverse",
     {"data.dataset": "abgrall_burgers_shock"}, 50_010),
]


def run(tag, preset, overrides, epochs):
    base = {"train.epochs": epochs, "train.log_every": 0}
    base.update(overrides)
    exp = override(get_preset(preset), base)
    t0 = time.time()
    state, s = Trainer(exp).train()
    rec = {
        "tag": tag,
        "epochs": epochs,
        "wall_s": round(time.time() - t0, 1),
        **{k: round(float(v), 5) for k, v in s.items()
           if "rel_l2" in k or k in ("lambda1", "lambda2")},
    }
    print(json.dumps(rec), flush=True)
    return rec


def main():
    only = set(sys.argv[1:])
    print("# Abgrall matched-dissipation study (identified nu=4.8e-3)",
          flush=True)
    for tag, preset, ov, ep in RUNS:
        if only and tag not in only:
            continue
        run(tag, preset, ov, ep)


if __name__ == "__main__":
    main()
