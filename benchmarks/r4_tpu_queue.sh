#!/bin/bash
# Round-4 TPU study queue — run ONE at a time (axon relay serializes TPU
# processes; two concurrent = multi-minute stalls). Ordered by VERDICT-r3
# priority with compile risk pushed last: the wide-net (8x200) L-BFGS
# compile wedged for 85+ min earlier this round (killed; al2/al1 hybrid
# cells dropped as an environmental negative), so the one remaining fresh
# L-BFGS compile (narrow hwan hybrid) is bounded, and the big vmapped
# Euler hybrid compile runs last so a wedge cannot starve the other
# studies.
#
# A HARD DEADLINE bounds every step: the driver runs bench.py at round
# end, and a still-running study would stall it on the serialized relay.
#
# Usage: bash benchmarks/r4_tpu_queue.sh 2>&1 | tee /tmp/r4_queue.log
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${QUEUE_DEADLINE:-$(( $(date +%s) + 18000 ))}  # default now+5h

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

# 1) remaining Abgrall matched-dissipation cells (VERDICT #1): cosine
#    budget-scaled laggards + the one safe (narrow-net) L-BFGS tail
step 5400 python benchmarks/abgrall_visc_followup.py \
  hl2_visc_cos200k al1_visc_cos200k hl2_visc_hybrid \
  2>>/tmp/r4_abgrall_fu.err | tee -a benchmarks/results/r4_abgrall_visc.jsonl

# 2) front-aware Mondrian on the real Euler ensemble (VERDICT #6)
step 5400 python benchmarks/uq_front_study.py

# 3) keep_streams quality-at-speed frontier at the scale config (VERDICT #5)
step 7200 python benchmarks/keepstreams_study.py

# 4) serving latency p50/p99 cold/warm (VERDICT #8)
step 3600 python benchmarks/serve_latency.py

# 5) Euler ensemble + hybrid tails + selection (VERDICT #3) — the fresh
#    vmapped-L-BFGS compile goes LAST so a pathological compile cannot
#    starve the queue
step 12000 python benchmarks/euler_best_study.py

echo "QUEUE DONE rc=0 at $(date -u)"
