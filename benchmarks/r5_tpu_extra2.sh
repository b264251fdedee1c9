#!/bin/bash
# Round-5 extra leg 2: the euler-1M HTTP serving cells that died in a relay
# SIGILL on their fresh bucket compile during r5_tpu_queue2.sh (PARITY §4t
# records the partial). Chained after r5_tpu_queue3.sh: waits for its PID
# to exit so only ONE TPU python process ever runs (axon relay serializes).
#   QUEUE_DEADLINE=<epoch_s> setsid nohup bash benchmarks/r5_tpu_extra2.sh \
#     >/tmp/r5_extra2.log 2>&1 &
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=${QUEUE_DEADLINE:?set QUEUE_DEADLINE explicitly}

# wait for queue3 (pid in /tmp/r5_queue3.pid) to finish
QPID=$(cat /tmp/r5_queue3.pid 2>/dev/null)
while [ -n "$QPID" ] && kill -0 "$QPID" 2>/dev/null; do
  if (( $(date +%s) > DEADLINE )); then echo "EXTRA2: deadline while waiting"; exit 0; fi
  sleep 30
done

left=$(( DEADLINE - $(date +%s) ))
if (( left < 300 )); then echo "EXTRA2: deadline reached, skipping"; exit 0; fi
timeout $(( left < 2700 ? left : 2700 )) python benchmarks/serve_latency.py --http euler_solo
echo "EXTRA2 DONE rc=$? at $(date -u)"
