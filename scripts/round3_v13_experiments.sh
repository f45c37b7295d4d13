#!/bin/bash
# Round-3 v13 chain — VM-reset recovery relaunch of the v12 tail.
# The VM hosting the v12 queue was reset (fresh /tmp): the dense dataset,
# the bench converged-state cache, and the queue itself were lost. The
# control resume already completed pre-reset (results committed), so v13 is
# v12 minus the resume, reordered so the two highest-value artifacts land
# first if the round ends mid-queue:
#   1. wait for the dense-dataset regeneration (pid arg)
#   2. blur32_dense_floor_margin — THE HEADLINE RUN: truncation masking +
#      batch floor 64 + sample-budget margin 2.0 (the floor run proved
#      masking kills the occupancy latch but zero margin starves
#      supervision; the margin restores volume)
#   3. bench v4 default — settled converge phase; builds the /tmp
#      converged-state cache the driver's round-end bench will hit
#   4. blur32_margin_nofine — curriculum-locked fade diagnostic
#   5. bench v4 HybridHashGrid + cache-hit verification
#   6. quality_dense — SHARP dense supervision-density test (its dataset
#      regenerates on CPU in the background from queue start)
set -u
cd "$(dirname "$0")/.."
RES=results/round3
WAIT_PID=${1:-}

# sharp dense dataset rebuild (CPU-only, overlaps with TPU work)
if [ ! -f /tmp/denerf_sharp_dense_ds/raw_events.npz ]; then
  JAX_PLATFORMS=cpu nohup python -u - > /tmp/sharpgen.log 2>&1 <<'EOF' &
from deblur_e_nerf_tpu.data import synthetic
synthetic.make_dataset(
    "/tmp/denerf_sharp_dense_ds", img_height=192, img_width=192,
    num_poses=3001, num_frames=3001, num_views=8,
    contrast_threshold=0.05, orbits=3,
)
print("SHARP DENSE DATASET DONE")
EOF
  echo $! > /tmp/sharpgen.pid
fi

if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID (dense dataset regeneration) ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "dataset gen exited ($(date +%H:%M)); settling 15s"
  sleep 15
fi
if [ ! -f /tmp/denerf_blur32_dense_ds/raw_events.npz ]; then
  echo "FATAL: dense dataset missing after generation wait" ; exit 1
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
  local rc=$?
  echo "=== $name done rc=$rc ($(date +%H:%M)) ==="
  # ADVICE r3: failures must survive /tmp loss — record rc + log tail
  echo "$name rc=$rc $(date +%H:%M)" >> "$RES/queue_status.txt"
  if [ "$rc" -ne 0 ]; then
    tail -40 "/tmp/r3_$name.log" > "$RES/${name}_FAILED_tail.log"
  fi
  sleep 75
}

run blur32_dense_floor_margin \
  configs/train/quality_sphere_blur32_dense_floor_margin.yaml \
  /tmp/denerf_blur32_dense_ds --batch-capacity 256

wait_tpu || exit 1
echo "=== bench v4 settled ($(date +%H:%M)) ==="
timeout 5400 python bench.py > /tmp/r3_bench4.json 2> /tmp/r3_bench4.log
echo "=== bench settled done rc=$? ($(date +%H:%M)) ==="
cat /tmp/r3_bench4.json
sleep 75

run blur32_margin_nofine \
  configs/train/quality_sphere_blur32_dense_floor_margin_nofine.yaml \
  /tmp/denerf_blur32_dense_ds --batch-capacity 256 --max-epochs 6

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

if [ "${SHARP_WAIT:-1}" != "0" ]; then
  # ADVICE r3: poll the OUTPUT (not a reusable pid) and bound the wait
  for i in $(seq 1 240); do
    [ -f /tmp/denerf_sharp_dense_ds/raw_events.npz ] && break
    grep -q "SHARP DENSE DATASET DONE" /tmp/sharpgen.log 2>/dev/null && break
    sleep 30
  done
fi
# ADVICE r3 (medium): quality_dense must NOT silently regenerate with
# quality_run defaults — the intended 192px/3001-pose/ct=0.05 dataset
# must exist
if [ ! -f /tmp/denerf_sharp_dense_ds/raw_events.npz ]; then
  echo "FATAL: sharp dense dataset missing; skipping quality_dense" \
    | tee -a "$RES/queue_status.txt"
else
  run quality_dense configs/train/quality_sphere_dense.yaml \
    /tmp/denerf_sharp_dense_ds --batch-capacity 2048
fi

echo "V13 ALL DONE $(date +%H:%M)"
