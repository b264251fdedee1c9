#!/usr/bin/env python
"""Remat-policy / unroll sweep at the 1M-pt scale config (round 3).

The scale step's roofline (BASELINE.md) counts the FULL-remat backward —
every microbatch's Taylor-2 forward runs twice. `sampling.microbatch_remat`
makes that a knob with identical math (tests/test_microbatch.py):

  'full'  recompute the body            (~10.2 MFLOP/pt, default)
  'dots'  save matmul outputs (~7 GB bf16 at 1M pts), skip the MXU recompute
  'none'  save everything (~13 GB — may RESOURCE_EXHAUSTED; that is data)

plus `sampling.microbatch_unroll` to software-pipeline consecutive
microbatches. Cells that fail (OOM) are recorded as rows, not crashes.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/scale_remat_study.py [tags...]
Writes benchmarks/results/r3_scale_remat.jsonl.
"""

import json
import sys
import time

from bench import _bench_chunk
from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

OUT = "benchmarks/results/r3_scale_remat.jsonl"

MAX = {"model.compute_dtype": "bfloat16", "model.mixed_elementwise": True}
BAL = {"model.compute_dtype": "bfloat16",
       "model.keep_streams": ("value", "xx")}

CELLS = [
    # (tag, policy overrides, remat, microbatch, unroll)
    ("max_full_mb128", MAX, "full", 128, 1),      # baseline (cached program)
    ("max_dots_mb128", MAX, "dots", 128, 1),
    ("max_none_mb128", MAX, "none", 128, 1),
    ("max_dots_mb128_u2", MAX, "dots", 128, 2),
    ("max_full_mb128_u2", MAX, "full", 128, 2),
    ("bal_full_mb128", BAL, "full", 128, 1),      # balanced baseline
    ("bal_dots_mb128", BAL, "dots", 128, 1),
]

# The canonical flagship config also runs its (single-microbatch) residual
# body under jax.checkpoint — the 56 µs step recomputes its forward during
# the backward pass. 'none' removes that recompute; measure whether the
# latency-bound step cares.
CANON_CELLS = [
    ("canon_full", "full"),    # baseline (cached program)
    ("canon_none", "none"),
    ("canon_dots", "dots"),
]


def run_canon(tag, remat):
    exp = override(
        get_preset("abgrall_admm"),
        {"sampling.microbatch_remat": remat},
    )
    row = {"tag": tag, "remat": remat, "config": "canonical_admm"}
    t0 = time.time()
    try:
        pts, steps = _bench_chunk(
            Trainer(exp), chunk_len=1000, n_chunks=20, n_f=exp.sampling.n_f
        )
        row.update(
            pts_per_sec=round(pts, 1),
            us_per_step=round(1e6 / steps, 2),
        )
    except Exception as e:
        row["error"] = f"{type(e).__name__}: {e}"[:300]
    row["wall_s"] = round(time.time() - t0, 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


def run(tag, policy, remat, mb, unroll):
    exp = override(
        get_preset("burgers_scale"),
        {
            "train.chunk": 10,
            "sampling.microbatch": mb,
            "sampling.microbatch_remat": remat,
            "sampling.microbatch_unroll": unroll,
            **policy,
        },
    )
    row = {"tag": tag, "remat": remat, "microbatch": mb, "unroll": unroll}
    t0 = time.time()
    try:
        pts, steps = _bench_chunk(
            Trainer(exp), chunk_len=10, n_chunks=2, n_f=exp.sampling.n_f
        )
        row.update(pts_per_sec=round(pts, 1), steps_per_sec=round(steps, 3))
    except Exception as e:  # RESOURCE_EXHAUSTED etc. — the negative is data
        row["error"] = f"{type(e).__name__}: {e}"[:300]
    row["wall_s"] = round(time.time() - t0, 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    only = set(sys.argv[1:])
    print("# scale remat/unroll study", flush=True)
    for tag, policy, remat, mb, unroll in CELLS:
        if only and tag not in only:
            continue
        run(tag, policy, remat, mb, unroll)
    for tag, remat in CANON_CELLS:
        if only and tag not in only:
            continue
        run_canon(tag, remat)
