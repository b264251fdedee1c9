"""Vmapped PINN ensembles — in-program replacement for the MPI job farm.

The reference parallelizes hyperparameter sweeps by farming independent
single-GPU training processes over MPI ranks with NVML idle-GPU polling
(``scheduler.py:70-127``, ``:157-169``). On TPU the same throughput
parallelism is ONE XLA program: stack E independent parameter pytrees (seeds
and any array-valued hyperparameters), ``vmap`` the fused train step over the
stack, and shard the ensemble axis across the mesh. No processes, no polling,
no pickled message protocol — and members training in lockstep amortize
compilation and dispatch.

Grid axes that change shapes or static config (layer widths, N_f, loss kind)
become separate jit specializations, orchestrated by
``pinns_tpu.parallel.sweep``.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax

from pinns_tpu.train.trainer import TrainState, make_adam_step


def init_ensemble_states(
    trainer,
    seeds: Sequence[int],
    rhos: Optional[Sequence[float]] = None,
) -> TrainState:
    """Independent init per member, stacked along a new leading axis.

    `rhos` gives each member its own ADMM penalty — the reference's main
    sweep axis (rho in {10..40}, ``scheduler.py:146-150``) runs as a single
    vmapped program instead of one farm job per value.
    """
    if rhos is not None and len(rhos) != len(seeds):
        raise ValueError("rhos must match seeds length")
    states = [
        trainer.init_state(
            seed=int(s), rho=None if rhos is None else float(rhos[i])
        )
        for i, s in enumerate(seeds)
    ]
    return jax.tree_util.tree_map(
        lambda *xs: jax.numpy.stack(xs, axis=0), *states
    )


def make_ensemble_chunk(trainer, chunk: int):
    """jitted scan of `chunk` vmapped steps over the stacked ensemble state.

    Returns run(stacked_state) -> (stacked_state, stacked metrics of shape
    (chunk, E)).
    """
    step = make_adam_step(trainer.problem, trainer.optimizer)
    vstep = jax.vmap(step)

    def chunk_fn(state, _):
        return vstep(state)

    return jax.jit(
        lambda s: jax.lax.scan(chunk_fn, s, None, length=chunk)
    )


def unstack_states(stacked: TrainState, n: int) -> List[TrainState]:
    return [
        jax.tree_util.tree_map(lambda x, i=i: x[i], stacked) for i in range(n)
    ]


def evaluate_ensemble(trainer, stacked: TrainState, n: int) -> List[dict]:
    """Per-member final evaluation (rel-L2 per field), host side."""
    return [trainer.evaluate(s) for s in unstack_states(stacked, n)]
