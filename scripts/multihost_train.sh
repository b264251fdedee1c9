#!/usr/bin/env bash
# Multi-host launch — the TPU-native replacement for the reference's SLURM +
# ibrun MPI scripts (slurm_Abgrall_ADMM). Run this same script on every host
# of the slice (or let your TPU VM launcher fan it out); jax.distributed
# wires the hosts over DCN and the SPMD program shards over all chips.
#
#   COORDINATOR=host0:8476 NUM_PROCESSES=4 PROCESS_ID=$i ./multihost_train.sh
#
# On Cloud TPU VMs the three variables are auto-detected by jax; they are only
# needed for manual clusters.
set -euo pipefail
PRESET="${PRESET:-burgers_scale}"

python - "$@" <<PY
import os
import sys

from pinns_tpu.parallel.mesh import multihost_init

multihost_init(
    coordinator_address=os.environ.get("COORDINATOR"),
    num_processes=int(os.environ.get("NUM_PROCESSES", "1")),
    process_id=int(os.environ.get("PROCESS_ID", "0")),
)

import jax

from pinns_tpu.cli import main

# shard the collocation axis over every chip in the slice; extra CLI args
# (e.g. --epochs, --set overrides) pass through
raise SystemExit(
    main([
        "train", "--preset", "${PRESET}",
        "--mesh-data", str(len(jax.devices())),
        *sys.argv[1:],
    ])
)
PY
