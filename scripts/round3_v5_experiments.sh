#!/bin/bash
# Round-3 DENSE headline queue (runs after the v4 queue exits):
#   1. blur32_dense          - blur ON,  dense 1.9M-event stream
#   2. blur32_dense_control  - blur OFF, identical data/schedule
# Tests the ROADMAP supervision-density hypothesis for the occupancy
# fog pedestal at 8x the events / half the contrast threshold.
set -u
cd "$(dirname "$0")/.."
DENSE_DS=${1:-/tmp/denerf_blur32_dense_ds}
WAIT_PID=${2:-}
RES=results/round3
mkdir -p "$RES"

if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID (v4 queue) ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "v4 queue exited ($(date +%H:%M)); settling 90s"
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

run blur32_dense configs/train/quality_sphere_blur32_dense.yaml "$DENSE_DS" --batch-capacity 256
run blur32_dense_control configs/train/quality_sphere_blur32_dense_control.yaml "$DENSE_DS" --batch-capacity 1024
echo "V5 ALL DONE $(date +%H:%M)"
