#!/bin/bash
# Round-5 blur-leg relaunch: the 04:02 blur run NaN'd at step 280 in the
# FOH weight path (pre-precision-fix code; the TPU repro showed the
# weight stage computing +-5.5e8 where CPU computes [0, 0.41]). This
# relaunch runs the SAME r5fix config on the fixed code (expm HIGHEST
# precision + non-finite update skip), fresh state, after the control
# leg frees the TPU. Resumes from its own checkpoints if rerun.
#   R5_BLUR_BUDGET_S  wall budget (default 10800 = 3h)
set -u
cd /root/repo
RES=results/round5
NAME=blur32_dense_r5fix_v2
BUDGET=${R5_BLUR_BUDGET_S:-10800}

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

wait_tpu || exit 1
echo "=== $NAME budget=${BUDGET}s ($(date +%H:%M)) ==="
resume=()
last=$(ls -d "$RES/$NAME"/checkpoints/epoch_* 2>/dev/null | sort | tail -1)
if [ -n "$last" ]; then resume=(--resume "$last"); fi
timeout "$BUDGET" python -u scripts/quality_run.py \
  --config configs/train/quality_sphere_blur32_dense_r5fix.yaml \
  --data-root /tmp/denerf_blur32_dense_ds \
  --log-dir "$RES/$NAME" --batch-capacity 1024 "${resume[@]}" \
  > "/tmp/r5_$NAME.log" 2>&1
rc=$?
echo "=== $NAME done rc=$rc ($(date +%H:%M)) ==="
echo "$NAME rc=$rc $(date +%H:%M)" >> "$RES/queue_status.txt"
tail -30 "/tmp/r5_$NAME.log" > "$RES/${NAME}_tail.log"
