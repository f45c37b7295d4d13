#!/bin/bash
# Round-4 queue: EDS-scale compile smoke, then the dense fade pair
# (blur-on headline first, control second) with per-run wall budgets so
# the TPU is FREE before the driver's end-of-round bench.
#
# Budgets (env-overridable):
#   R4_BLUR_BUDGET_S    blur-on run wall budget (default 13500 = 3.75h)
#   R4_CTRL_BUDGET_S    control run wall budget (default 6000 = 1.7h)
# Both runs checkpoint every epoch; round 5 resumes them to the full
# 40x500 schedule via --resume.
set -u
cd /root/repo
RES=results/round4
mkdir -p "$RES"

BLUR_BUDGET=${R4_BLUR_BUDGET_S:-13500}
CTRL_BUDGET=${R4_CTRL_BUDGET_S:-6000}

wait_tpu () {
  for i in $(seq 1 60); do
    out=$(timeout 75 python -c "
import jax, jax.numpy as jnp
print('TPU_OK', float(jnp.sum(jnp.ones(8))))
" 2>&1 | tail -1)
    case "$out" in *TPU_OK*) return 0;; esac
    echo "tpu probe $i: not ready" ; sleep 45
  done
  echo "TPU never became ready" ; return 1
}

if [ ! -f /tmp/denerf_blur32_dense_ds/raw_events.npz ]; then
  echo "FATAL: dense dataset missing" ; exit 1
fi

wait_tpu || exit 1
echo "=== eds_compile_smoke ($(date +%H:%M)) ==="
timeout 1500 python scripts/eds_compile_smoke.py \
  > /tmp/r4_eds_smoke.log 2>&1
rc=$?
echo "eds_smoke rc=$rc $(date +%H:%M)" >> "$RES/queue_status.txt"
tail -12 /tmp/r4_eds_smoke.log > "$RES/eds_smoke_tail.log"

run () {
  local name=$1 cfg=$2 budget=$3; shift 3
  wait_tpu || exit 1
  echo "=== $name budget=${budget}s ($(date +%H:%M)) ==="
  rm -rf "$RES/$name"
  timeout "$budget" python -u scripts/quality_run.py \
    --config "$cfg" --data-root /tmp/denerf_blur32_dense_ds \
    --log-dir "$RES/$name" --batch-capacity 256 "$@" \
    > "/tmp/r4_$name.log" 2>&1
  local rc=$?
  echo "=== $name done rc=$rc ($(date +%H:%M)) ==="
  echo "$name rc=$rc $(date +%H:%M)" >> "$RES/queue_status.txt"
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 124 ]; then
    tail -40 "/tmp/r4_$name.log" > "$RES/${name}_FAILED_tail.log"
  fi
  sleep 60
}

run blur32_dense_r4 \
  configs/train/quality_sphere_blur32_dense_r4.yaml "$BLUR_BUDGET"

run blur32_dense_r4_control \
  configs/train/quality_sphere_blur32_dense_r4_control.yaml "$CTRL_BUDGET"

echo "=== queue done ($(date +%H:%M)) ==="
