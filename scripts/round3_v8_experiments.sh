#!/bin/bash
# Round-3 v8 chain (replaces the v6/v7 queues; reordered for headline
# value after the truncation-masking fix landed):
#   1. blur32_dense_masked — blur ON, dense stream, NEW code
#      (ray_complete loss masking). Pairs with blur32_dense_control
#      (also new code) for the headline, and with blur32_dense (old
#      code) for the masking ablation.
#   2. quality_dense       — SHARP dense run at eff 32768 (the
#      supervision-density test, now with masking).
#   3. bench v3 rerun      — remat-chunked converge phase (first TPU
#      attempt OOM'd the unchunked converge compile).
#   4. bench HybridHashGrid — throughput for the quality-neutral hybrid
#      encoding (candidate default).
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:-}
RES=results/round3
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID (v5 queue) ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "v5 queue exited ($(date +%H:%M)); settling 90s"
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

run () {
  local name=$1 cfg=$2 ds=$3; shift 3
  wait_tpu || exit 1
  echo "=== $name ($(date +%H:%M)) ==="
  rm -rf "$RES/$name"
  python -u scripts/quality_run.py \
    --config "$cfg" --data-root "$ds" \
    --log-dir "$RES/$name" "$@" > "/tmp/r3_$name.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M)) ==="
  sleep 75
}

run blur32_dense_masked configs/train/quality_sphere_blur32_dense.yaml \
  /tmp/denerf_blur32_dense_ds --batch-capacity 256
run quality_dense configs/train/quality_sphere_dense.yaml \
  /tmp/denerf_sharp_dense_ds --batch-capacity 2048

wait_tpu || exit 1
echo "=== bench v3 rerun ($(date +%H:%M)) ==="
timeout 5400 python bench.py > /tmp/r3_bench2.json 2> /tmp/r3_bench2.log
echo "=== bench done rc=$? ($(date +%H:%M)) ==="
cat /tmp/r3_bench2.json
sleep 75
wait_tpu || exit 1
echo "=== bench hybrid ($(date +%H:%M)) ==="
DENERF_BENCH_OTYPE=HybridHashGrid timeout 5400 python bench.py \
  > /tmp/r3_bench_hybrid.json 2> /tmp/r3_bench_hybrid.log
echo "=== bench hybrid done rc=$? ($(date +%H:%M)) ==="
cat /tmp/r3_bench_hybrid.json
echo "V8 ALL DONE $(date +%H:%M)"
