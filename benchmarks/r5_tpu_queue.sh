#!/bin/bash
# Round-5 TPU queue — the VERDICT-r4 measurement legs, in priority order.
#
# 1) combo --r5 --skip-base 7000: first fully independent replication of the
#    ensemble->tails->selection result (base-1234 run: consensus regret 0.0,
#    residual-score regret .1031 — PARITY §4r). Writes r5_euler_best.jsonl.
# 2) keepstreams --seed 7 quality flank: second trajectory for the
#    policy-frontier contradiction (seed-1234: bal .0553 vs keep_xx .0329).
# 3) twosin selection transfer (VERDICT #5): ensemble+tails+both selectors
#    on the flagship data.
# 4) hwan_l2 floor attribution (VERDICT #4): l2_norm vs fixed-colloc.
# 5) combo --r5 --skip-base 99000: third independent base (n=3 with r4).
# 6) keepstreams --epochs 10000: longer-budget keep_xx vs bal (3.3x budget;
#    same compiled chunk program, no fresh wide-net compile).
# 7) optional extra hook: benchmarks/r5_tpu_extra.sh if present by then
#    (serve-latency binary re-measure lands mid-round).
#
# ONE TPU process at a time (axon relay serializes). Launch detached:
#   QUEUE_DEADLINE=<epoch_s> setsid nohup bash benchmarks/r5_tpu_queue.sh \
#     >/tmp/r5_queue.log 2>&1 &
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

# 1) first independent euler_best replication (base 7000), both selectors
step 9000 python benchmarks/r4_combo_study.py --r5 --resume --skip-base 7000

# 2) keepstreams seed flank (throughput skipped; quality rows only)
step 5400 python benchmarks/keepstreams_study.py --seed 7 f32 bal keep_xx keep_val max

# 3) selection transfer to TwoSin
step 4800 python benchmarks/r5_twosin_select.py 1234 --resume

# 4) hwan_l2 floor attribution
step 1800 python benchmarks/hwan_attrib_study.py

# 5) second independent euler_best replication (base 99000)
step 9000 python benchmarks/r4_combo_study.py --r5 --resume --skip-base 99000

# 6) longer-budget keepstreams cells (each its own step so either can fit)
step 3000 python benchmarks/keepstreams_study.py --epochs 10000 keep_xx
step 3600 python benchmarks/keepstreams_study.py --epochs 10000 bal

# 7) extra legs landed mid-round (e.g. serve-latency binary payload)
if [ -f benchmarks/r5_tpu_extra.sh ]; then
  bash benchmarks/r5_tpu_extra.sh
fi

echo "QUEUE DONE rc=0 at $(date -u)"
