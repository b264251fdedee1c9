#!/bin/bash
# Round-3 TPU study queue — run ONE at a time (axon relay serializes TPU
# processes; two concurrent = multi-minute stalls). Ordered by VERDICT-r2
# priority; each step appends to benchmarks/results/ so a crash resumes by
# re-running the remaining lines.
#
# A HARD DEADLINE bounds every step: the driver runs bench.py at round end,
# and a still-running study would stall it on the serialized relay. No step
# starts (or runs) past QUEUE_DEADLINE (epoch seconds; default 13:20 UTC
# 2026-08-18, ~2h before round end).
#
# Usage: bash benchmarks/r3_tpu_queue.sh 2>&1 | tee /tmp/r3_queue.log
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${QUEUE_DEADLINE:-1787059200}

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

# 1) driver-benchmark recapture (VERDICT #1)
step 3600 python bench.py

# 2) SWA study, solo cells first then ensembles (VERDICT #2)
step 7200 python benchmarks/swa_study.py 2>&1 | tee -a benchmarks/results/r3_swa.jsonl

# 3) Taylor-2 kernel vs XLA at the scale shape (VERDICT #3)
step 3600 python benchmarks/taylor2_kernel_bench.py

# 4) UQ calibration + export round-trip on chip (VERDICT #7)
step 10800 python benchmarks/uq_export_study.py

# 5) precision='default' at the Euler 1M envelope (VERDICT #4)
step 5400 python benchmarks/precision_1m_study.py 1234

# 6) L-BFGS lock-in tails on the matched recipes (round-2 leftover)
step 7200 python benchmarks/lockin_study.py 2>&1 | tee -a benchmarks/results/r3_lockin.jsonl

# 7) persistent causal selector (round-3 lever: over-training robustness)
step 10800 python benchmarks/causal_persist_study.py

# 8) literal 10^6 envelope cell (VERDICT #6) — longest, last
step 14400 python benchmarks/envelope_literal.py

echo "QUEUE DONE rc=0 at $(date -u)"
