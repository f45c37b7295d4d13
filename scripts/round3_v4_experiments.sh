#!/bin/bash
# Round-3 queue after blur30_v2 (targeted fog prior) completes:
#   1. blur30_v3          - blur ON,  UNIFORM-ONLY fog prior
#   2. blur30_control_v3  - blur OFF, identical data/schedule
#   3. quality_r3         - sharp-stream fade fix
#   4. quality_r3_hybrid  - HybridHashGrid quality-gap probe (6 epochs)
#   5. bench              - steady-state protocol bench
set -u
cd "$(dirname "$0")/.."
BLUR_DS=${1:?blur dataset dir}
RES=results/round3
mkdir -p "$RES"

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

run blur30_v3 configs/train/quality_sphere_blur30_v3.yaml "$BLUR_DS" --batch-capacity 256
run blur30_control_v3 configs/train/quality_sphere_blur30_control_v3.yaml "$BLUR_DS" --batch-capacity 1024
run quality_r3 configs/train/quality_sphere_r3.yaml /tmp/denerf_quality_ds --batch-capacity 2048
run quality_r3_hybrid configs/train/quality_sphere_r3_hybrid.yaml /tmp/denerf_quality_ds --batch-capacity 2048 --max-epochs 6
wait_tpu && { echo "=== bench ($(date +%H:%M)) ==="; \
  timeout 3600 python bench.py > /tmp/r3_bench.json 2> /tmp/r3_bench.log; \
  echo "=== bench done rc=$? ($(date +%H:%M)) ==="; cat /tmp/r3_bench.json; }
echo "ALL DONE $(date +%H:%M)"
