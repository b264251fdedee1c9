"""Hyperparameter sweep runner — replaces the reference's MPI/NVML job farm.

The reference sweeps with an MPI master-worker scheduler: rank 0 builds the
cartesian product of hyperparameter lists (recursive ``Get_Combinations``,
``scheduler.py:43-68``), polls NVML for idle GPUs every 30 s, and isends
pickled scenarios to worker ranks that subprocess the training script
(``scheduler.py:70-127, 157-169``). (That infrastructure had drifted — stale
import at ``scheduler.py:8``.)

Here the control plane is a host-side work queue over the local devices:

- configs that differ only in value axes (seed, rho) collapse into ONE
  vmapped ensemble program (``pinns_tpu.parallel.ensemble``) — strictly
  better than the farm for its actual payload (identical shapes);
- configs with DIFFERENT static shapes become separate jit specializations,
  dispatched CONCURRENTLY over the available devices (the farm's concurrent
  heterogeneous scheduling, ``scheduler.py:97-109``): one host thread per
  device, each unit pinned with the thread-local ``jax.default_device`` so
  distinct programs execute on distinct chips simultaneously;
- failures are retried and recorded (the scheduler's
  keep-farming-on-worker-death behavior) with results streamed to JSONL.
"""

from __future__ import annotations

import dataclasses
import itertools
import json
import queue
import threading
import time
import traceback
from typing import Any, Dict, List, Optional, Sequence, Tuple

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
    device: Optional[str] = None  # set when dispatched concurrently
    # monotonic execution span — lets callers verify units genuinely
    # overlapped (tests/test_sweep.py::test_sweep_concurrent_units_overlap)
    t_start: float = 0.0
    t_end: float = 0.0


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
    devices: Optional[Sequence] = None,
    concurrent: Optional[bool] = None,
) -> List[SweepResult]:
    """Run every configuration; returns one SweepResult per grid entry
    (grid order). JSONL rows stream in completion order.

    Groups whose members differ only along value axes (seed, rho) run as a
    single vmapped ensemble through the trainer's FULL optimizer schedule —
    including the reference's hybrid Adam -> L-BFGS switch
    (``Abgrall_ADMM.py:210-217``), which is what the MPI farm actually swept
    (``scheduler.py:146-150``). Groups that can't vmap (static-shape axes,
    e.g. the reference envelope's N_f axis) become separate work units and
    are dispatched concurrently over `devices` (default: all local devices)
    when more than one device and unit exist; pass ``concurrent=False`` to
    force the serial order. On a one-device host concurrency is a no-op and
    units run serially, with a visible log line saying so.
    """
    import jax

    from pinns_tpu.parallel.ensemble import run_ensemble
    from pinns_tpu.train import Trainer

    sink = open(out_path, "a") if out_path else None
    lock = threading.Lock()
    by_idx: Dict[int, SweepResult] = {}

    def emit(idx: int, res: SweepResult):
        with lock:
            by_idx[idx] = res
            if sink:
                sink.write(json.dumps(dataclasses.asdict(res)) + "\n")
                sink.flush()

    # group configs that differ only along vmappable (value-only) axes
    groups: Dict[tuple, List[Tuple[int, Dict]]] = {}
    for idx, overrides in enumerate(grid):
        groups.setdefault(_group_key(overrides), []).append((idx, overrides))

    # one work unit per vmapped group; one per member otherwise
    units: List[Tuple[str, List[Tuple[int, Dict]]]] = []
    degraded: List[Tuple[int, str]] = []  # (n_members, reason)
    for _, members in groups.items():
        exp0 = override(base, members[0][1])
        use_ensemble = (
            group_seeds
            and len(members) > 1
            and exp0.sampling.strategy != "rad"  # RAD re-draws live in
            # Trainer.train, not the vmapped chunk loop — solo path runs it
            and all(set(ov) & set(_VMAPPABLE) for _, ov in members)
        )
        if use_ensemble:
            units.append(("ensemble", members))
            continue
        if len(members) > 1:
            # no silent caps: say WHY this group degrades to per-member units
            if not group_seeds:
                reason = "group_seeds=False"
            elif exp0.sampling.strategy == "rad":
                reason = "sampling.strategy='rad' needs the solo train loop"
            else:
                reason = (
                    "some members have no vmappable axis "
                    f"(vmappable: {', '.join(_VMAPPABLE)})"
                )
            degraded.append((len(members), reason))
        units.extend(("solo", [m]) for m in members)

    if devices is None:
        devices = jax.local_devices()
    use_concurrent = (
        (concurrent if concurrent is not None else True)
        and len(devices) > 1
        and len(units) > 1
    )
    for n, reason in degraded:
        how = (
            f"as {'concurrent' if use_concurrent else 'serial'} units"
        )
        print(f"sweep: running {n} configs {how} — can't vmap: {reason}",
              flush=True)

    def run_unit(unit, dev_label: Optional[str]):
        kind, members = unit
        exp0 = override(base, members[0][1])
        n_epochs = epochs if epochs is not None else exp0.train.epochs
        m0 = time.monotonic()
        if kind == "ensemble":
            t0 = time.time()
            try:
                trainer = Trainer(exp0)
                seeds = [
                    ov.get("train.seed", exp0.train.seed) for _, ov in members
                ]
                rhos = None
                if any("loss.rho" in ov for _, ov in members):
                    rhos = [
                        ov.get("loss.rho", exp0.loss.rho) for _, ov in members
                    ]
                _, summaries = run_ensemble(
                    trainer, seeds, rhos=rhos, epochs=n_epochs
                )
                dt = time.time() - t0
                m1 = time.monotonic()
                for (idx, ov), s in zip(members, summaries):
                    emit(idx, SweepResult(
                        ov, "ok", s, seconds=dt / len(seeds),
                        device=dev_label, t_start=m0, t_end=m1,
                    ))
            except Exception:  # noqa: BLE001 — farm keeps going on failures
                err = traceback.format_exc(limit=5)
                for idx, ov in members:
                    emit(idx, SweepResult(
                        ov, "failed", error=err,
                        device=dev_label, t_start=m0, t_end=time.monotonic(),
                    ))
            return
        ((idx, ov),) = members
        last_err = None
        for attempt in range(1, retries + 2):
            t0 = time.time()
            try:
                trainer = Trainer(override(base, ov))
                _, summary = trainer.train(epochs=n_epochs)
                emit(idx, SweepResult(
                    ov, "ok", summary, seconds=time.time() - t0,
                    attempts=attempt, device=dev_label,
                    t_start=m0, t_end=time.monotonic(),
                ))
                return
            except Exception:  # noqa: BLE001
                last_err = traceback.format_exc(limit=5)
        emit(idx, SweepResult(
            ov, "failed", error=last_err, attempts=retries + 1,
            device=dev_label, t_start=m0, t_end=time.monotonic(),
        ))

    def run_unit_safe(unit, dev_label: Optional[str]):
        # belt-and-braces: run_unit records its own failures; this catches
        # anything outside those try blocks (e.g. an invalid override key)
        # so a worker thread can never die without emitting its results
        try:
            run_unit(unit, dev_label)
        except Exception:  # noqa: BLE001
            err = traceback.format_exc(limit=5)
            for idx, ov in unit[1]:
                emit(idx, SweepResult(
                    ov, "failed", error=err, device=dev_label,
                ))

    if use_concurrent:
        n_workers = min(len(devices), len(units))
        print(
            f"sweep: dispatching {len(units)} units concurrently over "
            f"{n_workers} devices",
            flush=True,
        )
        work: "queue.Queue" = queue.Queue()
        for u in units:
            work.put(u)

        def worker(dev):
            while True:
                try:
                    u = work.get_nowait()
                except queue.Empty:
                    return
                # thread-local pin: every array this unit creates lands on
                # `dev`, so its jit programs execute there while other
                # workers' programs execute on their own devices
                with jax.default_device(dev):
                    run_unit_safe(u, str(dev))

        threads = [
            threading.Thread(target=worker, args=(d,), daemon=True)
            for d in list(devices)[:n_workers]
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    else:
        for u in units:
            run_unit_safe(u, None)

    if sink:
        sink.close()
    return [by_idx[i] for i in range(len(grid))]
