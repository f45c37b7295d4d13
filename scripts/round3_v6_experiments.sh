#!/bin/bash
# Round-3 dense SHARP quality run (after the v5 dense blur pair):
# the clean supervision-density test — round-2 recipe, no occupancy
# guards, 3.25M-event sharp stream at 192^2 / C=0.05.
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
wait_tpu || exit 1
echo "=== quality_dense ($(date +%H:%M)) ==="
rm -rf "$RES/quality_dense"
python -u scripts/quality_run.py \
  --config configs/train/quality_sphere_dense.yaml \
  --data-root /tmp/denerf_sharp_dense_ds \
  --log-dir "$RES/quality_dense" --batch-capacity 2048 \
  > /tmp/r3_quality_dense.log 2>&1
echo "=== quality_dense done rc=$? ($(date +%H:%M)) ==="
echo "V6 ALL DONE"
