#!/bin/bash
# Round-5 TPU queue 3 — the legs left pending by r5_tpu_queue2.sh plus a
# live bench re-capture. Context: this VM restart wiped the persistent XLA
# compile cache (~/.cache/pinns_tpu_xla_cache is EMPTY), so every program
# below pays a fresh remote compile; bench.py doubles as the cache warmer
# for the driver's round-end bench run. Ledger: results/README.md.
#
# 1) keepstreams --seed 1234 keep_none: the cache-hit wall re-run for the
#    r4 keep_none anomaly (9.65M pts/s yet wall 1455.7 s; hypothesis:
#    fresh-compile tax inside wall_s). NOTE: with the cache wiped this run
#    pays a fresh compile AGAIN — the anomaly test becomes "wall_s minus
#    the separately-logged compile time ~= 311 s arithmetic".
# 2) bench.py live: fresh BENCH_CACHE capture + warms the canonical/65k/
#    scale programs the driver's round-end bench will request.
# 3) keepstreams --epochs 10000 --seed 7 keep_xx: is the keep_xx
#    non-monotonicity (.0329@3k -> .0574@10k, seed 1234) seed-stable?
# 4) keepstreams --epochs 10000 f32: the long-budget control.
#
# ONE TPU process at a time (axon relay serializes). Launch detached:
#   QUEUE_DEADLINE=<epoch_s> setsid nohup bash benchmarks/r5_tpu_queue3.sh \
#     >/tmp/r5_queue3.log 2>&1 &
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

# 1) keep_none wall anomaly (VERDICT-r4 weak #4)
step 1800 python benchmarks/keepstreams_study.py --seed 1234 keep_none

# 2) live bench capture + compile-cache warm for the round-end driver run
step 3100 python bench.py

# 3) keep_xx@10k seed flank (non-monotonicity replication)
step 3600 python benchmarks/keepstreams_study.py --epochs 10000 --seed 7 keep_xx

# 4) f32 control at the 10k budget
step 8400 python benchmarks/keepstreams_study.py --epochs 10000 f32

echo "QUEUE3 DONE rc=0 at $(date -u)"
