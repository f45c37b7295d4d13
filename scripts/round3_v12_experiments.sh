#!/bin/bash
# Round-3 v12 chain (v11 + the curriculum-locked fade diagnostic after
# the margin run). Original v11 rationale (replaces v9 tail + v10 after the step-1000
# floor-run readout): masking prevents the occupancy latch (occ 0.04 vs
# 0.80 at step 1000) but the zero-margin budget truncation-masks ~96% of
# events — the margin run is the headline candidate. The planned
# control_floor is dropped: the existing control never truncates
# (ray_truncation_rate 0.000), so masking+floor are no-ops for blur-off
# and the resumed blur32_dense_control IS the code-matched control.
#   1. wait for the in-flight blur32_dense_floor run (diagnostic arc:
#      does clean-but-starved supervision still fade?)
#   2. blur32_dense_control resume — finish epochs 10-15
#   3. blur32_dense_floor_margin — blur ON, masking + floor 64 +
#      sample-budget margin 1.5 (the headline run)
#   4. bench v4 default — settled converge phase, builds the /tmp state
#      cache for the driver's round-end bench
#   5. bench v4 HybridHashGrid
#   6. bench v4 cache-hit verification
#   7. quality_dense — SHARP dense supervision-density test
set -u
cd "$(dirname "$0")/.."
RES=results/round3
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID (blur32_dense_floor run) ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "floor run exited ($(date +%H:%M)); settling 90s"
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

run blur32_dense_floor_margin \
  configs/train/quality_sphere_blur32_dense_floor_margin.yaml \
  /tmp/denerf_blur32_dense_ds --batch-capacity 256

run blur32_margin_nofine \
  configs/train/quality_sphere_blur32_dense_floor_margin_nofine.yaml \
  /tmp/denerf_blur32_dense_ds --batch-capacity 256 --max-epochs 6

wait_tpu || exit 1
echo "=== bench v4 settled ($(date +%H:%M)) ==="
timeout 5400 python bench.py > /tmp/r3_bench4.json 2> /tmp/r3_bench4.log
echo "=== bench settled done rc=$? ($(date +%H:%M)) ==="
cat /tmp/r3_bench4.json
sleep 75

wait_tpu || exit 1
echo "=== bench v4 hybrid ($(date +%H:%M)) ==="
DENERF_BENCH_OTYPE=HybridHashGrid timeout 5400 python bench.py \
  > /tmp/r3_bench_hybrid.json 2> /tmp/r3_bench_hybrid.log
echo "=== bench hybrid done rc=$? ($(date +%H:%M)) ==="
cat /tmp/r3_bench_hybrid.json
sleep 75

wait_tpu || exit 1
echo "=== bench v4 cache-hit ($(date +%H:%M)) ==="
timeout 3600 python bench.py > /tmp/r3_bench4b.json 2> /tmp/r3_bench4b.log
echo "=== bench cache-hit done rc=$? ($(date +%H:%M)) ==="
cat /tmp/r3_bench4b.json
sleep 75

run quality_dense configs/train/quality_sphere_dense.yaml \
  /tmp/denerf_sharp_dense_ds --batch-capacity 2048

echo "V12 ALL DONE $(date +%H:%M)"
