#!/bin/bash
# Round-4 TPU queue, leg 3 — runs after r4_tpu_queue2.sh's keepstreams tail
# (keep_val/keep_none/max relaunched separately) completes.
#
# 1) combo --resume --best-only: re-run the L-BFGS tails from the committed
#    Adam-ensemble checkpoint (deterministic -> reproduces PARITY §4r's
#    members, oracle u .0338 / score-pick u .1369) and grade the NEW
#    consensus-distance selector on exactly the instance where the residual
#    score failed.
# 2) keepstreams --seed 7 quality flank: same budget, second trajectory, to
#    tell policy signal from single-seed noise (the seed-1234 cells put
#    'bal' at .0553 vs keep_xx .0329 — suspicious for the policy that keeps
#    MORE f32 streams).
# 3) combo 7000: a second fully independent 8-member ensemble+tails run
#    (VERDICT-r3 #3 wanted >=3 runs; round 4 has one full TPU run + CPU
#    toys), grading both selectors.
#
# Run ONE at a time (axon relay serializes TPU processes). Launch detached:
#   setsid nohup bash benchmarks/r4_tpu_queue3.sh >/tmp/r4_queue3.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${QUEUE_DEADLINE:?set QUEUE_DEADLINE explicitly}

step() {  # step <max_timeout_s> <cmd...>
  local want=$1; shift
  local left=$(( DEADLINE - $(date +%s) ))
  if (( left < 300 )); then
    echo "QUEUE DEADLINE reached — skipping: $*"
    return 1
  fi
  local t=$(( want < left ? want : left ))
  timeout "$t" "$@"
}

# 0) relay probe
step 300 python -c "
import jax, jax.numpy as jnp
f = jax.jit(jax.grad(lambda x: jnp.sum(jnp.tanh(x)**2)))
print('relay ok', float(f(jnp.ones((37,))).sum()), jax.devices())
" || exit 66

# 1) consensus selector on the real §4r members (checkpoint resume)
step 3600 python benchmarks/r4_combo_study.py --resume --best-only

# 2) keepstreams seed flank (throughput skipped; quality rows only)
step 5400 python benchmarks/keepstreams_study.py --seed 7 f32 bal keep_xx keep_val max

# 3) independent euler_best replication, both selectors
step 9000 python benchmarks/r4_combo_study.py --skip-base 7000

echo "QUEUE DONE rc=0 at $(date -u)"
