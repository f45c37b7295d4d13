#!/bin/bash
# Round-5 queue: the dense quality pair to a verdict (VERDICT r4 #3),
# blur-on headline first, control second, each under a hard wall-clock
# budget (VERDICT r4 #9) so the TPU is free for perf work + the
# driver's end-of-round bench.
#
# Budgets (env-overridable):
#   R5_BLUR_BUDGET_S    blur-on run wall budget (default 10800 = 3h)
#   R5_CTRL_BUDGET_S    control run wall budget (default 5400 = 1.5h)
# Both runs checkpoint every epoch and resume via --resume if rerun.
set -u
cd /root/repo
RES=results/round5
mkdir -p "$RES"

BLUR_BUDGET=${R5_BLUR_BUDGET_S:-10800}
CTRL_BUDGET=${R5_CTRL_BUDGET_S:-5400}

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

run () {
  local name=$1 cfg=$2 budget=$3; shift 3
  wait_tpu || exit 1
  echo "=== $name budget=${budget}s ($(date +%H:%M)) ==="
  local resume=()
  if [ -d "$RES/$name/checkpoints" ]; then
    local last
    last=$(ls -d "$RES/$name"/checkpoints/epoch_* 2>/dev/null | sort | tail -1)
    if [ -n "$last" ]; then
      resume=(--resume "$last")
    fi
  fi
  timeout "$budget" python -u scripts/quality_run.py \
    --config "$cfg" --data-root /tmp/denerf_blur32_dense_ds \
    --log-dir "$RES/$name" "${resume[@]}" "$@" \
    > "/tmp/r5_$name.log" 2>&1
  local rc=$?
  echo "=== $name done rc=$rc ($(date +%H:%M)) ==="
  echo "$name rc=$rc $(date +%H:%M)" >> "$RES/queue_status.txt"
  tail -30 "/tmp/r5_$name.log" > "$RES/${name}_tail.log"
  sleep 75
}

# r5fix pair (v2): occ guards ON (thre_floor + max_occupied_fraction),
# eff 8192 (4x supervision), margin 1.25, prepass div 2, coarse march
# buffers sized to the ray count (the v1 blur leg silently truncated
# 94% of superblock demand and NaN'd pre-precision-fix). Capacity 1024
# sized for the expected unlatched batch (~8192/m = 300-800 events).
run blur32_dense_r5fix_v2 \
  configs/train/quality_sphere_blur32_dense_r5fix.yaml "$BLUR_BUDGET" \
  --batch-capacity 1024

run blur32_dense_r5fix_control_v2 \
  configs/train/quality_sphere_blur32_dense_r5fix_control.yaml \
  "$CTRL_BUDGET" --batch-capacity 1024

echo "=== queue done ($(date +%H:%M)) ==="
