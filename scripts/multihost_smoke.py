#!/usr/bin/env python
"""Multi-process (DCN-path) smoke drive: one sharded training chunk.

The reference's multi-rank story actually ran: SLURM launched N MPI ranks
that farmed independent jobs (``scheduler.py:140-169``). The TPU-native
equivalent is ONE SPMD program across processes — ``jax.distributed`` over
DCN with the same pjit step. This script is one process of that program; the
test harness (``tests/test_multihost.py``) spawns two of them on localhost
with 4 virtual CPU devices each, so the jax.distributed/gloo code path in
``pinns_tpu.parallel.mesh.multihost_init`` executes for real, not just its
single-process early return.

Usage (run once per process):
    python scripts/multihost_smoke.py --process-id 0 --num-processes 2 \
        --port 19731 [--local-devices 4] [--steps 30]

Each process prints `RESULT pid=<i> loss=<final loss>`; all processes must
print the SAME loss (the collocation axis is sharded over the GLOBAL device
set; loss/grad reductions cross the process boundary through gloo
collectives).
"""

import argparse
import os
import sys


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--port", type=int, default=19731)
    ap.add_argument("--local-devices", type=int, default=4)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()

    # must happen before jax initializes a backend
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={args.local_devices}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from pinns_tpu.parallel.mesh import make_mesh, multihost_init

    multihost_init(
        coordinator_address=f"127.0.0.1:{args.port}",
        num_processes=args.num_processes,
        process_id=args.process_id,
    )
    n_global = len(jax.devices())
    assert n_global == args.num_processes * args.local_devices, n_global

    import numpy as np

    from pinns_tpu.config import override
    from pinns_tpu.experiments import get_preset
    from pinns_tpu.parallel.sharding import shard_trainer, state_shardings
    from pinns_tpu.train import Trainer

    exp = override(
        get_preset("abgrall_admm"),
        {
            "model.layers": (2, 16, 16, 1),
            "sampling.n_f": 64 * n_global,
            "optimizer.kind": "adam",
            "train.chunk": args.steps,
        },
    )
    trainer = Trainer(exp)
    mesh = make_mesh(data=n_global, ensemble=1)
    shard_trainer(trainer, mesh)

    # Multi-process state creation: jit the init with explicit out_shardings
    # so every process materializes only its addressable shards — no host
    # array ever crosses the process boundary.
    template = jax.eval_shape(trainer.init_state)
    shardings = state_shardings(template, mesh)
    state = jax.jit(trainer.init_state, out_shardings=shardings)()

    run = trainer._get_chunk("adam", args.steps)
    state, metrics = run(state)
    loss = float(np.asarray(metrics["loss"][-1]))
    assert np.isfinite(loss)
    # the loss is a fully-replicated scalar: every process must see the same
    print(f"RESULT pid={args.process_id} loss={loss:.10e}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
