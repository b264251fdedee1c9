#!/bin/bash
# Round-4 TPU queue, leg 2 — resumes after the first queue died with its
# session mid `uq_front_study` (the 8-member Euler Adam ensemble had just
# finished ~75 min of training; no checkpoint existed, work lost).
#
# Changes vs r4_tpu_queue.sh:
# - uq_front + euler_best(base 1234) are MERGED into r4_combo_study.py:
#   they train the identical 8-member euler_weak_fast Adam ensemble (same
#   seeds, same schedule), so one training feeds both studies (~75 min
#   saved), and the stacked state is checkpointed immediately after
#   training (--resume skips the retrain after any crash).
# - serve_latency moved BEFORE keepstreams: it is the short/certain step,
#   and keepstreams emits per-policy rows incrementally so a deadline cut
#   mid-study still lands useful cells.
#
# Run ONE at a time (axon relay serializes TPU processes). Launch detached
# (setsid) so an agent-session crash cannot kill the queue again:
#   setsid nohup bash benchmarks/r4_tpu_queue2.sh >/tmp/r4_queue2.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
# default: round-4 end (start ts 1787151110 + 8h) minus 35 min for bench.py
DEADLINE=${QUEUE_DEADLINE:-1787177810}

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

# 0) relay probe (fail fast if it is down again)
step 300 python -c "
import jax, jax.numpy as jnp
f = jax.jit(jax.grad(lambda x: jnp.sum(jnp.tanh(x)**2)))
print('relay ok', float(f(jnp.ones((37,))).sum()), jax.devices())
" || exit 66

# 1) combined UQ-front + Euler-best (VERDICT #6 + #3, shared ensemble)
step 7200 python benchmarks/r4_combo_study.py --resume

# 2) serving latency p50/p99 cold/warm (VERDICT #8)
step 2400 python benchmarks/serve_latency.py

# 3) keep_streams quality-at-speed frontier (VERDICT #5, incremental rows)
step 7200 python benchmarks/keepstreams_study.py

# 4) bonus: independent euler_best replications if time remains
step 7200 python benchmarks/r4_combo_study.py --skip-base 7000

echo "QUEUE DONE rc=0 at $(date -u)"
