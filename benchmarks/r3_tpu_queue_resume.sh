#!/bin/bash
# Round-3 TPU queue, resume leg — the first leg (r3_tpu_queue.sh) captured
# bench.py + 4 solo TwoSin SWA cells before its parent session died; this
# leg runs the remainder. One TPU process at a time (relay serializes);
# hard deadline so nothing overlaps the driver's end-of-round bench.
#
# Usage: QUEUE_DEADLINE=<epoch> setsid nohup bash benchmarks/r3_tpu_queue_resume.sh \
#          >> /tmp/r3_queue.log 2>&1 & echo $! > /tmp/r3_queue.pid
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${QUEUE_DEADLINE:-1787082000}

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

# 2b) SWA study — remaining cells (Euler solos + both ensembles)
step 9000 python benchmarks/swa_study.py eu_fast_swa25 eu_1m_swa25 \
  2>&1 | tee -a benchmarks/results/r3_swa.jsonl
step 9000 python benchmarks/swa_study.py ts_ens8_swa25 \
  2>&1 | tee -a benchmarks/results/r3_swa.jsonl

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

# 2c) Euler 8-seed SWA ensemble — wide-net, ~8x solo wall; run only if the
# deadline still leaves room after the higher-priority steps
step 9000 python benchmarks/swa_study.py eu_ens8_swa25 \
  2>&1 | tee -a benchmarks/results/r3_swa.jsonl

echo "QUEUE DONE rc=0 at $(date -u)"
