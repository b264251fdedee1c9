#!/bin/bash
# Extra round-5 TPU legs picked up by r5_tpu_queue.sh's final hook.
# Self-guarded deadline (same instant as the parent queue's QUEUE_DEADLINE).
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
DEADLINE=1787218156
left=$(( DEADLINE - $(date +%s) ))
if (( left < 300 )); then echo "EXTRA: deadline reached, skipping"; exit 0; fi
# JSON vs binary HTTP serving throughput at 64k/1M (VERDICT-r4 #7)
timeout $(( left < 2700 ? left : 2700 )) python benchmarks/serve_latency.py --http twosin_solo euler_solo
echo "EXTRA DONE rc=$? at $(date -u)"
