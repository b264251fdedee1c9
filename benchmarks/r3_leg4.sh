#!/bin/bash
# Leg 4: runs after the resume queue (3230) and leg 3 (4787) both exit.
# One TPU process at a time; hard deadline guard so nothing overlaps the
# driver's end-of-round benchmark.
#
# Usage: setsid nohup bash benchmarks/r3_leg4.sh >> /tmp/r3_queue.log 2>&1 &
#        echo $! > /tmp/r3_leg4.pid
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${QUEUE_DEADLINE:-1787082000}

for pid in "$@"; do
  while kill -0 "$pid" 2>/dev/null; do sleep 60; done
done

step() {  # step <max_timeout_s> <cmd...>
  local want=$1; shift
  local left=$(( DEADLINE - $(date +%s) ))
  if (( left < 300 )); then
    echo "LEG4 DEADLINE reached — skipping: $*"
    return 1
  fi
  local t=$(( want < left ? want : left ))
  timeout "$t" "$@"
}

# relay probe before touching the chip
step 300 python -c "
import jax, jax.numpy as jnp
f = jax.jit(jax.grad(lambda x: jnp.sum(jnp.tanh(x)**2)))
print('leg4 relay ok', float(f(jnp.ones((37,))).sum()))
" || exit 66

# 1) 200k-solo precision attribution cell (PARITY 4o)
step 1800 python benchmarks/lockin_study.py eu_fast_precdefault \
  2>&1 | tee -a benchmarks/results/r3_lockin.jsonl
# 2) seeds 7/99 of the winning Euler hybrid recipe
step 2400 python benchmarks/lockin_study.py eu_fast_lockin_s7 \
  2>&1 | tee -a benchmarks/results/r3_lockin.jsonl
step 2400 python benchmarks/lockin_study.py eu_fast_lockin_s99 \
  2>&1 | tee -a benchmarks/results/r3_lockin.jsonl

echo "LEG4 DONE rc=0 at $(date -u)"
