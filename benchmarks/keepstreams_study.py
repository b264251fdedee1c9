#!/usr/bin/env python
"""keep_streams quality-at-speed frontier at the scale config (VERDICT-r3 #5).

BASELINE's scale table has a 2.9x throughput gap between the balanced
bf16-stream policy (3.90M pts/s, quality >= f32) and the max policy
(11.35M, known quality-unsafe on long Euler budgets), with the
intermediate keep_streams points unmeasured ON THE SCALE PROBLEM ITSELF.
This measures, per policy, BOTH the steady-state throughput (chained
chunk timing, bench.py methodology) AND the converged rel-L2 at a fixed
3000-epoch budget of the same program, on `burgers_scale` (1M pts/step,
8x200, mb=128):

  f32        compute_dtype=''            (control)
  bal        bf16, keep {'value','xx'}   (the 'quality >= f32' point)
  keep_xx    bf16, keep {'xx'}           (only the u_xx chain exempt)
  keep_val   bf16, keep {'value'}
  keep_none  bf16, keep {}               (all streams quantized)
  max        bf16, keep {}, mixed_elementwise (the 11.35M policy)

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/keepstreams_study.py [tags] [--seed N]
Writes benchmarks/results/r4_keepstreams.jsonl. ``--seed`` re-runs cells
under a different train seed (rows tagged ``{tag}_s{N}``) — the quality
flank distinguishing policy signal from single-trajectory noise at the
short budget.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.train import Trainer

OUT = "benchmarks/results/r4_keepstreams.jsonl"
EPOCHS = 3000

POLICIES = [
    ("f32", {}),
    ("bal", {"model.compute_dtype": "bfloat16",
             "model.keep_streams": ("value", "xx")}),
    ("keep_xx", {"model.compute_dtype": "bfloat16",
                 "model.keep_streams": ("xx",)}),
    ("keep_val", {"model.compute_dtype": "bfloat16",
                  "model.keep_streams": ("value",)}),
    ("keep_none", {"model.compute_dtype": "bfloat16"}),
    ("max", {"model.compute_dtype": "bfloat16",
             "model.mixed_elementwise": True}),
]


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def throughput(trainer, n_f, chunk=10, n_chunks=3):
    """Chained-state timing (CLAUDE.md: independent calls under-report)."""
    state = trainer.init_state()
    run = trainer._get_chunk("adam", chunk)
    state, _ = run(state)  # compile + warm
    jax.block_until_ready(state)
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        for _ in range(n_chunks):
            state, metrics = run(state)
        jax.block_until_ready(state)
        assert bool(jnp.isfinite(metrics["loss"][-1]))
        best = min(best, time.time() - t0)
    return n_f / (best / (n_chunks * chunk))


def run(tag, ov, seed=None, skip_throughput=False, epochs=EPOCHS):
    exp = override(get_preset("burgers_scale"), {
        "train.epochs": epochs, "train.chunk": 100, "train.log_every": 0,
        **({"train.seed": seed} if seed is not None else {}),
        **ov,
    })
    tr = Trainer(exp)
    pts = 0 if skip_throughput else throughput(
        Trainer(override(exp, {"train.chunk": 10})), exp.sampling.n_f
    )
    t0 = time.time()
    _, s = tr.train()
    tag = tag if seed is None else f"{tag}_s{seed}"
    emit({
        "tag": tag if epochs == EPOCHS else f"{tag}_e{epochs}",
        "epochs": epochs,
        "pts_per_sec": int(pts),
        "wall_s": round(time.time() - t0, 1),
        **{k: round(float(v), 5) for k, v in s.items() if "rel_l2" in k},
    })


if __name__ == "__main__":
    args = sys.argv[1:]
    seed = None
    epochs = EPOCHS
    if "--seed" in args:
        i = args.index("--seed")
        seed = int(args[i + 1])
        del args[i:i + 2]
    if "--epochs" in args:
        i = args.index("--epochs")
        epochs = int(args[i + 1])
        del args[i:i + 2]
    only = set(args)
    for tag, ov in POLICIES:
        if only and tag not in only:
            continue
        # seed/budget flanks: throughput is seed- and budget-independent
        # (same program), skip it
        run(tag, ov, seed=seed, epochs=epochs,
            skip_throughput=seed is not None or epochs != EPOCHS)
