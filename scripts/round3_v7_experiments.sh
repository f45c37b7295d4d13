#!/bin/bash
# Round-3 bench rerun (after the v6 dense sharp run): the first v3-bench
# TPU attempt OOM'd in the UNCHUNKED converge-phase compile (26.3 GiB
# program; see bench.py conv_chunk comment). Reruns with the remat-chunked
# converge field path.
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID (v6 queue) ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "v6 queue exited ($(date +%H:%M)); settling 90s"
  sleep 90
fi
wait_tpu () {
  for i in $(seq 1 90); do
    out=$(timeout 75 python -c "
import jax, jax.numpy as jnp
print('TPU_OK', float(jnp.sum(jnp.ones(8))))
" 2>&1 | tail -1)
    case "$out" in *TPU_OK*) return 0;; esac
    echo "tpu probe $i: not ready" ; sleep 45
  done
  echo "TPU never became ready" ; return 1
}
wait_tpu || exit 1
echo "=== bench v3 rerun ($(date +%H:%M)) ==="
timeout 5400 python bench.py > /tmp/r3_bench2.json 2> /tmp/r3_bench2.log
echo "=== bench done rc=$? ($(date +%H:%M)) ==="
cat /tmp/r3_bench2.json
sleep 75
# speed-mode measurement: HybridHashGrid matched HashGrid quality
# step-for-step on quality_r3 (results/round3/quality_r3_hybrid), so it
# is a candidate default — measure its protocol throughput
wait_tpu || exit 1
echo "=== bench hybrid ($(date +%H:%M)) ==="
DENERF_BENCH_OTYPE=HybridHashGrid timeout 5400 python bench.py \
  > /tmp/r3_bench_hybrid.json 2> /tmp/r3_bench_hybrid.log
echo "=== bench hybrid done rc=$? ($(date +%H:%M)) ==="
cat /tmp/r3_bench_hybrid.json
echo "V7 ALL DONE $(date +%H:%M)"
