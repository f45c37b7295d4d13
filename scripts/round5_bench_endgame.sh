#!/bin/bash
# Round-5 perf endgame: runs AFTER the quality queue frees the TPU.
#  1. TPU-marked pixel-bandwidth finiteness repro (VERDICT r4 #6)
#  2. bench.py with phase-A regeneration (the flagship flip to
#     HybridHashGrid changed the converged-state cache key)
#  3. a second bench run from the fresh cache (the number the driver
#     will reproduce) — this pair also measures the f16 cache
#     round-trip delta on m (ADVICE r4)
set -u
cd /root/repo
RES=results/round5
mkdir -p "$RES"

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
echo "=== bench regen ($(date +%H:%M)) ==="
DENERF_BENCH_BUDGET_S=${R5_BENCH_REGEN_BUDGET_S:-5400} \
DENERF_BENCH_PHASE_A_EST_S=2400 \
timeout 5700 python bench.py > "$RES/bench_regen.log" 2>&1
echo "bench_regen rc=$? $(date +%H:%M)" >> "$RES/queue_status.txt"
tail -3 "$RES/bench_regen.log" | grep -a '"metric"' \
  > "$RES/bench_regen_json.txt" || true
sleep 75

wait_tpu || exit 1
echo "=== bench final (cache hit) ($(date +%H:%M)) ==="
timeout 3000 python bench.py > "$RES/bench_final.log" 2>&1
echo "bench_final rc=$? $(date +%H:%M)" >> "$RES/queue_status.txt"
tail -3 "$RES/bench_final.log" | grep -a '"metric"' \
  > "$RES/bench_final_json.txt" || true

wait_tpu || exit 1
echo "=== tpu_pb_repro ($(date +%H:%M)) ==="
timeout 900 python scripts/tpu_pb_repro.py > "$RES/tpu_pb_repro.log" 2>&1
echo "tpu_pb_repro rc=$? $(date +%H:%M)" >> "$RES/queue_status.txt"

echo "=== endgame done ($(date +%H:%M)) ==="
