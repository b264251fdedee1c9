#!/bin/bash
# Round-5 TPU queue 2 — the legs clipped by r5_tpu_queue.sh's deadline,
# plus the follow-ups its own results raised. Ledger: results/README.md.
#
# 1) keepstreams --epochs 10000 bal: the paired cell for keep_xx@10k
#    (first attempt died at 1353 s of a ~2900 s run — deadline, not crash).
# 2) serve_latency --http: JSON vs binary (x-npy) served throughput at
#    64k/1M (VERDICT-r4 #7 re-measure; binary path landed mid-round).
# 3) keepstreams --epochs 10000 --seed 7 keep_xx: is the keep_xx
#    non-monotonicity (.0329@3k -> .0574@10k, seed 1234) seed-stable?
# 4) keepstreams --epochs 10000 f32: the control at the long budget —
#    substantiates "hand long runs to f32" with a same-budget number.
#
# ONE TPU process at a time (axon relay serializes). Launch detached:
#   QUEUE_DEADLINE=<epoch_s> setsid nohup bash benchmarks/r5_tpu_queue2.sh \
#     >/tmp/r5_queue2.log 2>&1 &
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

# 1) the clipped bal@10k cell (keep_xx@10k took 1903 s; bal is ~1.4x slower)
step 4200 python benchmarks/keepstreams_study.py --epochs 10000 bal

# 2) JSON vs binary serving throughput (VERDICT-r4 #7)
step 2700 python benchmarks/serve_latency.py --http twosin_solo euler_solo

# 3) keep_xx@10k seed flank (non-monotonicity replication)
step 2700 python benchmarks/keepstreams_study.py --epochs 10000 --seed 7 keep_xx

# 4) f32 control at the 10k budget
step 8400 python benchmarks/keepstreams_study.py --epochs 10000 f32

echo "QUEUE2 DONE rc=0 at $(date -u)"
