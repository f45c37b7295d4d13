#!/bin/bash
# Round-3 endgame (after blur30_v3 completes, ~85 min of TPU left):
#   1. bench           - first full run of the v3 steady-state protocol
#                        bench (vs_baseline) on real TPU
#   2. blur30_control_v3 (6 epochs) - blur-OFF arm of the headline pair,
#                        truncated for the wall; compare at matched steps
#   3. dense_probe     - blur ON on the 1.9M-event dense stream
#                        (round-4 supervision-density hypothesis probe)
set -u
cd "$(dirname "$0")/.."
BLUR_DS=${1:-/tmp/denerf_blur32_ds}
DENSE_DS=${2:-/tmp/denerf_blur32_dense_ds}
RES=results/round3

wait_tpu () {
  for i in $(seq 1 40); do
    out=$(timeout 75 python -c "
import jax, jax.numpy as jnp
print('TPU_OK', float(jnp.sum(jnp.ones(8))))
" 2>&1 | tail -1)
    case "$out" in *TPU_OK*) return 0;; esac
    echo "tpu probe $i: not ready" ; sleep 30
  done
  echo "TPU never became ready" ; return 1
}

wait_tpu || exit 1
echo "=== bench ($(date +%H:%M)) ==="
timeout 2400 python bench.py > /tmp/r3_bench.json 2> /tmp/r3_bench.log
echo "=== bench done rc=$? ($(date +%H:%M)) ==="
cat /tmp/r3_bench.json
sleep 45

wait_tpu || exit 1
echo "=== blur30_control_v3 ($(date +%H:%M)) ==="
rm -rf "$RES/blur30_control_v3"
python -u scripts/quality_run.py \
  --config configs/train/quality_sphere_blur30_control_v3.yaml \
  --data-root "$BLUR_DS" --log-dir "$RES/blur30_control_v3" \
  --batch-capacity 1024 --max-epochs 6 \
  > /tmp/r3_blur30_control_v3.log 2>&1
echo "=== control done rc=$? ($(date +%H:%M)) ==="
sleep 45

wait_tpu || exit 1
echo "=== dense_probe ($(date +%H:%M)) ==="
rm -rf "$RES/dense_probe"
python -u scripts/quality_run.py \
  --config configs/train/quality_sphere_blur30_v3.yaml \
  --data-root "$DENSE_DS" --log-dir "$RES/dense_probe" \
  --batch-capacity 256 --max-epochs 4 \
  > /tmp/r3_dense_probe.log 2>&1
echo "=== dense_probe done rc=$? ($(date +%H:%M)) ==="
echo "ALL DONE $(date +%H:%M)"
