"""Device mesh construction and multi-host initialization.

The reference's entire distributed story is an MPI master-worker job farm
scheduling independent single-GPU processes with NVML polling
(``scheduler.py:70-127``) — no tensor communication at all. The TPU-native
equivalents (SURVEY.md §2.5, §5.8):

- intra-slice: a ``jax.sharding.Mesh`` with axes ('ensemble', 'data');
  pjit/GSPMD inserts psum/all-gather collectives over ICI;
- multi-host: ``jax.distributed.initialize`` over DCN, same SPMD program;
- the control plane (hyperparameter farm) becomes vmapped ensembles
  (``pinns_tpu.parallel.ensemble``) and a host-side sweep runner
  (``pinns_tpu.parallel.sweep``) — no NVML, the mesh is statically
  partitioned.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh

ENSEMBLE_AXIS = "ensemble"
DATA_AXIS = "data"


def make_mesh(
    data: int = 0,
    ensemble: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh with axes (ensemble, data). data=0 means "all remaining devices"."""
    devices = list(devices if devices is not None else jax.devices())
    if data == 0:
        if len(devices) % ensemble:
            raise ValueError(
                f"{len(devices)} devices not divisible by ensemble={ensemble}"
            )
        data = len(devices) // ensemble
    n = data * ensemble
    if n > len(devices):
        raise ValueError(
            f"mesh {ensemble}x{data} needs {n} devices, have {len(devices)}"
        )
    grid = np.array(devices[:n]).reshape(ensemble, data)
    return Mesh(grid, (ENSEMBLE_AXIS, DATA_AXIS))


def multihost_init(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Join a multi-host run over DCN. On single-host this is a no-op.

    All hosts then see the global device set and run the same SPMD program —
    replacing the reference's SLURM+mpirun launch (``slurm_Abgrall_ADMM:11``).
    On the CPU backend (tests, ``scripts/multihost_smoke.py``) cross-process
    collectives run over gloo.
    """
    if num_processes is None or num_processes <= 1:
        return
    # NOTE: checked via config, not jax.default_backend() — the backend must
    # not initialize before jax.distributed.initialize.
    import os

    platforms = jax.config.jax_platforms or os.environ.get("JAX_PLATFORMS", "")
    if "cpu" in str(platforms):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
