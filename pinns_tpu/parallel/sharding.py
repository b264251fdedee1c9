"""Data-parallel collocation sharding of the training step.

The natural PINN parallelism: collocation points are embarrassingly parallel
(every loss term is a pointwise reduction, ``Abgrall_ADMM.py:129-130``), so
the collocation batch — and the ADMM (z, dual) vectors indexed by it — shard
along the mesh 'data' axis while params, optimizer state, and the (tiny)
supervised set stay replicated. pjit/GSPMD then partitions the whole fused
step: per-shard Taylor-mode residuals, psum for the loss/grad reductions over
ICI, replicated parameter update. On-device resampling generates the new
batch directly in its sharded layout (partitionable threefry), so scaling N_f
to millions of points costs no host traffic and no gathers.

Nothing else changes: the SAME ``Trainer`` chunks run sharded after
``shard_trainer(trainer, mesh)`` + ``place_state``.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from pinns_tpu.parallel.mesh import DATA_AXIS, ENSEMBLE_AXIS

# Cross-device collective op kinds GSPMD can insert when partitioning a
# program over a mesh (XLA HLO instruction names).
COLLECTIVE_OPS = (
    "all-reduce", "all-gather", "collective-permute", "all-to-all",
    "reduce-scatter",
)


def collective_census(compiled_text: str) -> Dict[str, int]:
    """Count GSPMD collectives in compiled HLO text (``compiled.as_text()``).

    The compiler-level scaling check for a placement: member-sharded
    ensembles (``place_ensemble`` with ``ensemble=E, data=1``) must compile
    with ZERO cross-member collectives — the embarrassingly-parallel
    equivalent of the reference farm's independent ranks
    (``scheduler.py:97-109``) — while collocation-DP legitimately pays
    all-reduces for the loss/grad reductions. Measured census at the real
    Euler ensemble chunk: PARITY §6 (r4_ensemble_shard.jsonl); pinned as a
    regression test in tests/test_parallel.py.

    Fusion-safe: instruction names keep the op kind as a prefix
    ("%all-reduce.12 = ..."); matches op starts, not words in metadata.
    """
    counts: Dict[str, int] = {}
    for op in COLLECTIVE_OPS:
        n = len(
            re.findall(rf"\b{op}(?:-start|-done)?\.?\d*\s*=", compiled_text)
        )
        if n:
            counts[op] = n
    return counts


def _replicated_tree(tree, mesh):
    repl = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda _: repl, tree)


def state_shardings(state, mesh) -> Any:
    """A TrainState-shaped tree of NamedShardings: colloc/ADMM row-sharded
    along 'data', everything else replicated."""
    row = NamedSharding(mesh, P(DATA_AXIS))
    admm = (
        None
        if state.admm is None
        else jax.tree_util.tree_map(lambda _: row, state.admm)
    )
    repl = NamedSharding(mesh, P())
    return type(state)(
        params=_replicated_tree(state.params, mesh),
        opt_state=_replicated_tree(state.opt_state, mesh),
        admm=admm,
        colloc=row,
        key=repl,
        epoch=repl,
        rho=None if state.rho is None else repl,
    )


def place_state(state, mesh):
    """device_put the state into its data-parallel layout on the mesh."""
    return jax.device_put(state, state_shardings(state, mesh))


def shard_trainer(trainer, mesh):
    """Configure a Trainer for data-parallel execution on `mesh`.

    Validates divisibility, installs the collocation sharding constraint used
    by on-device resampling, and clears compiled-chunk caches so steps
    re-trace with the constraint. Returns the trainer (for chaining).
    """
    n_f = trainer.exp.sampling.n_f
    n_data = mesh.shape[DATA_AXIS]
    if n_f % n_data:
        raise ValueError(
            f"sampling.n_f={n_f} must be divisible by the mesh 'data' axis "
            f"size {n_data}"
        )
    trainer.problem.colloc_sharding = NamedSharding(mesh, P(DATA_AXIS))
    trainer._chunks.clear()
    return trainer


def tp_param_shardings(params, mesh, axis: str = ENSEMBLE_AXIS) -> Any:
    """Tensor-parallel shardings for the MLP params: hidden weight matrices
    split along their OUTPUT dimension over `axis` (and the next layer's
    input dimension correspondingly), biases along the same dim.

    With 20-200-wide nets this is bandwidth-silly (SURVEY.md §2.5 marks TP
    optional/low-priority), but it is fully supported: GSPMD inserts the
    activation all-gathers/reduce-scatters, and it composes with the 'data'
    axis. Useful once nets grow past a single core's arithmetic sweet spot.
    """
    repl = NamedSharding(mesh, P())
    col = NamedSharding(mesh, P(None, axis))
    row = NamedSharding(mesh, P(axis, None))
    net = params["net"]
    out = []
    n = len(net)
    for i, layer in enumerate(net):
        w_shard = col if i < n - 1 else row  # head contracts the sharded dim
        b_shard = col if i < n - 1 else repl
        # extra first-layer keys (shock-path parameters) are tiny: replicate
        out.append(
            {
                k: {"W": w_shard, "b": b_shard}.get(k, repl)
                for k in layer
            }
        )
    return {
        "net": out,
        "coeffs": jax.tree_util.tree_map(lambda _: repl, params["coeffs"]),
    }


def place_params_tp(params, mesh, axis: str = ENSEMBLE_AXIS):
    """device_put params into the tensor-parallel layout."""
    return jax.device_put(params, tp_param_shardings(params, mesh, axis))


def ensemble_state_shardings(stacked_state, mesh) -> Any:
    """Shardings for a stacked (vmapped) ensemble state: leading axis over
    'ensemble', collocation/ADMM additionally over 'data'."""
    lead = NamedSharding(mesh, P(ENSEMBLE_AXIS))
    lead_row = NamedSharding(mesh, P(ENSEMBLE_AXIS, DATA_AXIS))
    admm = (
        None
        if stacked_state.admm is None
        else jax.tree_util.tree_map(lambda _: lead_row, stacked_state.admm)
    )
    return type(stacked_state)(
        params=jax.tree_util.tree_map(lambda _: lead, stacked_state.params),
        opt_state=jax.tree_util.tree_map(lambda _: lead, stacked_state.opt_state),
        admm=admm,
        colloc=lead_row,
        key=lead,
        epoch=lead,
        rho=None if stacked_state.rho is None else lead,
    )


def place_ensemble(stacked_state, mesh):
    return jax.device_put(
        stacked_state, ensemble_state_shardings(stacked_state, mesh)
    )
