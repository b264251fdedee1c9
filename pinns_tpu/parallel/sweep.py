"""Hyperparameter sweep runner — replaces the reference's MPI/NVML job farm.

The reference sweeps with an MPI master-worker scheduler: rank 0 builds the
cartesian product of hyperparameter lists (recursive ``Get_Combinations``,
``scheduler.py:43-68``), polls NVML for idle GPUs every 30 s, and isends
pickled scenarios to worker ranks that subprocess the training script
(``scheduler.py:70-127, 157-169``). (That infrastructure had drifted — stale
import at ``scheduler.py:8``.)

Here the control plane is a host-side function over one statically-partitioned
accelerator: configs that differ only in seed collapse into ONE vmapped
ensemble program (``pinns_tpu.parallel.ensemble``); configs with different
static shapes/hyperparameters run as separate jit specializations; failures
are retried and recorded (the scheduler's keep-farming-on-worker-death
behavior) with results streamed to JSONL.
"""

from __future__ import annotations

import dataclasses
import itertools
import json
import time
import traceback
from typing import Any, Dict, List, Optional, Sequence

from pinns_tpu.config import Experiment, override


def cartesian_grid(param_lists: Dict[str, Sequence]) -> List[Dict[str, Any]]:
    """All combinations of dotted-key override lists.

    Equivalent of the scheduler's ``Assemble_Parameters``/``Get_Combinations``
    (``scheduler.py:43-68``): {'sampling.n_f': [100, 200], 'loss.rho': [10]}
    -> [{'sampling.n_f': 100, 'loss.rho': 10}, {'sampling.n_f': 200, ...}].
    """
    keys = list(param_lists.keys())
    return [
        dict(zip(keys, combo))
        for combo in itertools.product(*(param_lists[k] for k in keys))
    ]


@dataclasses.dataclass
class SweepResult:
    overrides: Dict[str, Any]
    status: str  # 'ok' | 'failed'
    summary: Optional[Dict[str, float]] = None
    error: Optional[str] = None
    seconds: float = 0.0
    attempts: int = 1


_VMAPPABLE = ("train.seed", "loss.rho")  # value-only axes a vmapped
# ensemble can sweep in one program (shape/static axes get their own jit)


def _group_key(overrides: Dict) -> tuple:
    return tuple(
        sorted((k, v) for k, v in overrides.items() if k not in _VMAPPABLE)
    )


def run_sweep(
    base: Experiment,
    grid: Sequence[Dict[str, Any]],
    retries: int = 1,
    out_path: Optional[str] = None,
    group_seeds: bool = True,
    epochs: Optional[int] = None,
) -> List[SweepResult]:
    """Run every configuration; returns one SweepResult per grid entry.

    Groups whose members differ only along value axes (seed, rho) run as a
    single vmapped ensemble through the trainer's FULL optimizer schedule —
    including the reference's hybrid Adam -> L-BFGS switch
    (``Abgrall_ADMM.py:210-217``), which is what the MPI farm actually swept
    (``scheduler.py:146-150``). Groups that can't vmap (static-shape axes)
    run serially, with a visible log line saying so.
    """
    from pinns_tpu.parallel.ensemble import run_ensemble
    from pinns_tpu.train import Trainer

    results: List[SweepResult] = []
    sink = open(out_path, "a") if out_path else None

    def emit(res: SweepResult):
        results.append(res)
        if sink:
            sink.write(json.dumps(dataclasses.asdict(res)) + "\n")
            sink.flush()

    # group configs that differ only along vmappable (value-only) axes
    groups: Dict[tuple, List[Dict]] = {}
    for overrides in grid:
        groups.setdefault(_group_key(overrides), []).append(overrides)

    for _, members in groups.items():
        exp0 = override(base, members[0])
        n_epochs = epochs if epochs is not None else exp0.train.epochs
        use_ensemble = (
            group_seeds
            and len(members) > 1
            and exp0.sampling.strategy != "rad"  # RAD re-draws live in
            # Trainer.train, not the vmapped chunk loop — serial path runs it
            and all(
                set(m) & set(_VMAPPABLE) for m in members
            )
        )
        if len(members) > 1 and not use_ensemble:
            # no silent caps: say WHY this group degrades to serial runs
            if not group_seeds:
                reason = "group_seeds=False"
            elif exp0.sampling.strategy == "rad":
                reason = "sampling.strategy='rad' needs the solo train loop"
            else:
                reason = (
                    "some members have no vmappable axis "
                    f"(vmappable: {', '.join(_VMAPPABLE)})"
                )
            print(
                f"sweep: running {len(members)} configs serially — {reason}",
                flush=True,
            )
        if use_ensemble:
            t0 = time.time()
            try:
                trainer = Trainer(exp0)
                seeds = [
                    m.get("train.seed", exp0.train.seed) for m in members
                ]
                rhos = None
                if any("loss.rho" in m for m in members):
                    rhos = [m.get("loss.rho", exp0.loss.rho) for m in members]
                _, summaries = run_ensemble(
                    trainer, seeds, rhos=rhos, epochs=n_epochs
                )
                dt = time.time() - t0
                for m, s in zip(members, summaries):
                    emit(SweepResult(m, "ok", s, seconds=dt / len(seeds)))
            except Exception:  # noqa: BLE001 — farm keeps going on any failure
                err = traceback.format_exc(limit=5)
                for m in members:
                    emit(SweepResult(m, "failed", error=err))
            continue

        for m in members:
            last_err = None
            for attempt in range(1, retries + 2):
                t0 = time.time()
                try:
                    trainer = Trainer(override(base, m))
                    _, summary = trainer.train(epochs=n_epochs)
                    emit(
                        SweepResult(
                            m, "ok", summary,
                            seconds=time.time() - t0, attempts=attempt,
                        )
                    )
                    break
                except Exception:  # noqa: BLE001
                    last_err = traceback.format_exc(limit=5)
            else:
                emit(SweepResult(m, "failed", error=last_err, attempts=retries + 1))

    if sink:
        sink.close()
    return results
