#!/usr/bin/env python
"""Member-sharded wide-net ensembles on the 8-vdev CPU mesh (VERDICT-r3
weak #7).

Wide (>=100-wide) trunks saturate a chip per member, so vmapped ensembles
cost ~E x the solo wall clock (PARITY §4l) and the shipped mitigation is
"shard members over the `ensemble` mesh axis" — which had no recorded
datapoint. This box has ONE physical core (nproc=1), so an 8-virtual-device
wall-clock comparison cannot show parallel speedup (all vdevs share the
core); what CAN be honestly measured here:

1. **Collective census (the compiler-level scaling proof).** Compile the
   vmapped training chunk with the stacked state placed on (a) one device,
   (b) ensemble=8 x data=1, (c) ensemble=1 x data=8, and count the
   cross-device collectives GSPMD inserted. Zero collectives under (b)
   proves member sharding is embarrassingly parallel: on a real slice the
   per-step wall clock is the SOLO wall clock (speedup = min(E, n_dev)),
   with no communication term to erode it. (c) shows the contrast: the
   existing collocation-DP path legitimately pays all-reduces for the loss.
2. **Partitioning overhead at 1 core.** Chained chunk timing of (a) vs (b):
   any slowdown is pure GSPMD partitioning overhead (same total FLOPs on
   the same core), an upper bound on the per-device overhead a real slice
   would see.

Runs entirely on CPU (forces 8 virtual devices before JAX import); safe to
run while the TPU queue owns the relay.

Usage: python benchmarks/ensemble_shard_study.py
Writes benchmarks/results/r4_ensemble_shard.jsonl.
"""

import json
import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402
import numpy as np  # noqa: E402

from pinns_tpu.config import override  # noqa: E402
from pinns_tpu.experiments import get_preset  # noqa: E402
from pinns_tpu.parallel.ensemble import (  # noqa: E402
    init_ensemble_states,
    make_ensemble_chunk,
)
from pinns_tpu.parallel.mesh import make_mesh  # noqa: E402
from pinns_tpu.parallel.sharding import (  # noqa: E402
    collective_census as census,
    place_ensemble,
)
from pinns_tpu.train import Trainer  # noqa: E402

OUT = "benchmarks/results/r4_ensemble_shard.jsonl"
CHUNK = 10
N_TIMED = 3


def emit(rec):
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def measure(tag, run, stacked):
    lowered = run.lower(stacked)
    compiled = lowered.compile()
    cc = census(compiled.as_text())
    state, _ = run(stacked)  # warm (compiled above, but warm the buffers)
    jax.block_until_ready(state)
    best = float("inf")
    for _ in range(N_TIMED):
        t0 = time.perf_counter()
        state, metrics = run(state)  # chained: state -> state
        jax.block_until_ready(state)
        best = min(best, time.perf_counter() - t0)
    assert bool(np.isfinite(np.asarray(metrics["loss"][-1])).all())
    emit({
        "tag": tag,
        "nproc": os.cpu_count(),
        "chunk_epochs": CHUNK,
        "best_chunk_s": round(best, 3),
        "collectives": cc,
        "n_collectives": sum(cc.values()),
    })
    return best


def main():
    exp = override(get_preset("euler_weak_fast"), {
        "sampling.n_f": 256, "train.log_every": 0,
        "sampling.t_curriculum_epochs": 0,
    })
    tr = Trainer(exp)
    seeds = [exp.train.seed + i for i in range(8)]
    run = make_ensemble_chunk(tr, CHUNK, "adam")

    # the chunk donates its input state — build a fresh stacked state per
    # placement (init is cheap; training state buffers get consumed)
    def fresh():
        return init_ensemble_states(tr, seeds)

    base = measure("vmap_1dev", run, fresh())
    e8 = measure(
        "ens8_data1", run, place_ensemble(fresh(), make_mesh(ensemble=8))
    )
    d8 = measure(
        "ens1_data8", run, place_ensemble(fresh(), make_mesh(ensemble=1))
    )
    emit({
        "tag": "summary",
        "overhead_ens8_vs_1dev_pct": round(100 * (e8 / base - 1), 1),
        "overhead_data8_vs_1dev_pct": round(100 * (d8 / base - 1), 1),
        "note": "1 physical core: vdevs share it, so ratios measure GSPMD "
                "partitioning overhead, not parallel speedup; zero "
                "collectives on ens8_data1 is the scaling guarantee",
    })


if __name__ == "__main__":
    main()
