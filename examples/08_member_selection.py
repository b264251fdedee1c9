"""Ensemble -> per-member L-BFGS tails -> truth-free member selection.

The reference picks its best run by eye over per-run CSVs
(``Abgrall_ADMM.py:311-319``); this is the principled replacement. L-BFGS
tails are seed-flaky on the shock recipes (PARITY §4o/§4r: 2-of-8 tailed
Euler members improved, the rest regressed), so the deployable workflow is
train an ensemble, tail every member, then select WITHOUT ground truth:

- ``score``   — data misfit + mean-square residual at fresh points (the
  training objective's truth-free surrogate). Measured flank: it stops
  discriminating inside the low-residual cluster (regret .10 on the round-4
  Euler instance).
- ``consensus`` — field distance to the ANCHOR ensemble's mean prediction
  (the Adam members the tails started from). Found the oracle member
  (regret 0.0) on that same instance but misranked the round-5 base-7000
  replication (regret .0173).
- ``rank`` — Borda rank-sum agreement of the two signals (consensus
  tie-break). Picked the oracle member on ALL THREE measured Euler
  instances (regret 0.0; PARITY §4t) — the shipped default for converged
  shock ensembles. Raw rows: benchmarks/results/r5_euler_best.jsonl.

Serve the ensemble MEAN (example 06, `export --calibrate`) when you want
robustness with zero selection risk; select a member when chasing the tail
upside. CLI twin of this script:

    python -m pinns_tpu export --preset ... --checkpoint tail_m*.ckpt \
        --select rank --anchor adam_m*.ckpt --out artifact/

Run:  python examples/08_member_selection.py [--quick]
"""

import sys

import numpy as np

from pinns_tpu.config import override
from pinns_tpu.experiments import get_preset
from pinns_tpu.parallel.ensemble import (
    run_ensemble,
    select_member,
    selection_scores,
    stack_states,
    unstack_states,
)
from pinns_tpu.train import Trainer

E = 4
adam = override(get_preset("euler_weak_fast"), {"train.log_every": 0})
tail = override(adam, {
    "optimizer.kind": "hybrid",
    "optimizer.switch_epoch": adam.train.epochs,
    "train.epochs": adam.train.epochs + 50,
})
if "--quick" in sys.argv:
    quick = {
        "model.layers": (2, 16, 16, 3),
        "sampling.n_f": 256,
        "sampling.t_curriculum_epochs": 0,
        "train.epochs": 2000,
        "train.chunk": 500,
        "optimizer.schedule_epochs": 2000,
    }
    adam = override(adam, quick)
    tail = override(tail, {
        **quick,
        "optimizer.switch_epoch": 2000,
        "train.epochs": 2050,
        "optimizer.lbfgs.max_iters": 20,
    })

tr_adam, tr_tail = Trainer(adam), Trainer(tail)
seeds = [adam.train.seed + i for i in range(E)]

# 1) one vmapped program trains all members
stacked_adam, _ = run_ensemble(tr_adam, seeds)

# 2) per-member L-BFGS tails (solo: the vmapped wide-net L-BFGS compile is
#    pathological on the remote relay; narrow nets could vmap this too)
tailed, summaries = [], []
for m in unstack_states(stacked_adam, E):
    st, s = tr_tail.train(m)
    tailed.append(st)
    summaries.append(s)
stacked = stack_states(tailed)

# 3) rank members with quantities the run already owns — no exact solution
scores = selection_scores(tr_tail, stacked, E, seed=seeds[0] + 777,
                          anchor_params=stacked_adam.params)
i_score = select_member(scores, by="score")
i_cons = select_member(scores, by="consensus")
i_rank = select_member(scores, by="rank")

print(f"\n{'member':>6} {'resid score':>12} {'consensus':>10} "
      f"{'rel-L2 u (oracle view)':>24}")
for i, (sc, s) in enumerate(zip(scores, summaries)):
    mark = ("  <- score" if i == i_score else "") + (
        "  <- consensus" if i == i_cons else "") + (
        "  <- rank" if i == i_rank else "")
    print(f"{i:>6} {sc['score']:>12.5f} {sc['consensus']:>10.5f} "
          f"{s['rel_l2_u']:>24.4f}{mark}")

oracle = int(np.argmin([s["rel_l2_u"] for s in summaries]))
print(f"\noracle member (needs ground truth): {oracle}")
for name, i_pick in (("score", i_score), ("consensus", i_cons),
                     ("rank", i_rank)):
    print(f"{name} pick: {i_pick}  regret "
          f"{summaries[i_pick]['rel_l2_u'] - summaries[oracle]['rel_l2_u']:+.4f}")
