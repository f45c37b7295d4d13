#!/bin/bash
# Round-3 experiment queue (single TPU chip, sequential):
#   1. blur-on  (S=30, full-circuit-blurred events)   - the headline
#   2. blur-off control (same data, same schedule)
#   3. quality_sphere_r3 (fade mitigations)
# Usage: round3_experiments.sh <blur_dataset_dir>
# Logs/artifacts land in results/round3/<name>/ (psnr_vs_steps.csv,
# metrics.yaml) and /tmp/r3_<name>.log (driver stdout).
set -u
cd "$(dirname "$0")/.."
BLUR_DS=${1:?blur dataset dir}
RES=results/round3
mkdir -p "$RES"

run () {
  local name=$1 cfg=$2 ds=$3; shift 3
  echo "=== $name ($(date +%H:%M)) ==="
  python -u scripts/quality_run.py \
    --config "$cfg" --data-root "$ds" \
    --log-dir "$RES/$name" "$@" > "/tmp/r3_$name.log" 2>&1
  echo "=== $name done rc=$? ($(date +%H:%M)) ==="
}

sleep 60
run blur30 configs/train/quality_sphere_blur30.yaml "$BLUR_DS" --batch-capacity 256
sleep 60
run blur30_control configs/train/quality_sphere_blur30_control.yaml "$BLUR_DS" --batch-capacity 1024
sleep 60
run quality_r3 configs/train/quality_sphere_r3.yaml /tmp/denerf_quality_ds --batch-capacity 2048
echo "ALL DONE $(date +%H:%M)"
