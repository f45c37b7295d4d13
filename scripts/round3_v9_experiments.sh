#!/bin/bash
# Round-3 v9 chain (relaunch of the v8 plan after the session hosting
# the v5-v8 queues died mid-control-run):
#   1. bench v3 full       — first full-size TPU attempt of the
#      remat-chunked converge phase (the earlier attempt OOM'd the
#      unchunked compile; the fix has only been smoke-tested). Runs
#      FIRST to de-risk the driver's round-end bench.
#   2. blur32_dense_floor  — blur ON, dense stream, truncation masking
#      + batch floor 64 (the code-matched headline rerun).
#   3. blur32_dense_control resume — finish epochs 10-15 of the killed
#      control (monitor-score sidecar seeded for ranking).
#   4. blur32_dense_control_floor — blur OFF, masking + floor 64
#      (code-matched control for #2).
#   5. bench HybridHashGrid — throughput of the quality-neutral hybrid
#      encoding (candidate default).
#   6. quality_dense       — SHARP dense run (supervision-density test
#      with masking) if time remains.
set -u
cd "$(dirname "$0")/.."
RES=results/round3

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

wait_tpu || exit 1
echo "=== bench v3 full ($(date +%H:%M)) ==="
timeout 5400 python bench.py > /tmp/r3_bench3.json 2> /tmp/r3_bench3.log
echo "=== bench done rc=$? ($(date +%H:%M)) ==="
cat /tmp/r3_bench3.json
sleep 75

run blur32_dense_floor configs/train/quality_sphere_blur32_dense_floor.yaml \
  /tmp/denerf_blur32_dense_ds --batch-capacity 256

wait_tpu || exit 1
echo "=== blur32_dense_control resume ($(date +%H:%M)) ==="
python -u scripts/quality_run.py \
  --config configs/train/quality_sphere_blur32_dense_control.yaml \
  --data-root /tmp/denerf_blur32_dense_ds \
  --log-dir "$RES/blur32_dense_control" --batch-capacity 1024 \
  --resume "$RES/blur32_dense_control/checkpoints/epoch_0009" \
  > /tmp/r3_blur32_dense_control_resume.log 2>&1
echo "=== control resume done rc=$? ($(date +%H:%M)) ==="
sleep 75

run blur32_dense_control_floor \
  configs/train/quality_sphere_blur32_dense_control_floor.yaml \
  /tmp/denerf_blur32_dense_ds --batch-capacity 1024

wait_tpu || exit 1
echo "=== bench hybrid ($(date +%H:%M)) ==="
DENERF_BENCH_OTYPE=HybridHashGrid timeout 5400 python bench.py \
  > /tmp/r3_bench_hybrid.json 2> /tmp/r3_bench_hybrid.log
echo "=== bench hybrid done rc=$? ($(date +%H:%M)) ==="
cat /tmp/r3_bench_hybrid.json
sleep 75

run quality_dense configs/train/quality_sphere_dense.yaml \
  /tmp/denerf_sharp_dense_ds --batch-capacity 2048

echo "V9 ALL DONE $(date +%H:%M)"
