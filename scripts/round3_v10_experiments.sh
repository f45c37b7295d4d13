#!/bin/bash
# Round-3 v10 chain (waits for the v9 queue): the default-otype bench on
# the settle+cache code — the first TPU run of the settled converge
# phase at protocol size. Builds the /tmp converged-state cache so the
# driver's round-end bench.py run skips the ~50-min phase A, then runs
# once more to verify the cache-hit path end-to-end on TPU.
set -u
cd "$(dirname "$0")/.."
WAIT_PID=${1:-}
if [ -n "$WAIT_PID" ]; then
  echo "waiting for pid $WAIT_PID (v9 queue) ..."
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
  echo "v9 queue exited ($(date +%H:%M)); settling 90s"
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
echo "=== bench v4 settled ($(date +%H:%M)) ==="
timeout 5400 python bench.py > /tmp/r3_bench4.json 2> /tmp/r3_bench4.log
echo "=== bench settled done rc=$? ($(date +%H:%M)) ==="
cat /tmp/r3_bench4.json
sleep 75

wait_tpu || exit 1
echo "=== bench v4 cache-hit ($(date +%H:%M)) ==="
timeout 3600 python bench.py > /tmp/r3_bench4b.json 2> /tmp/r3_bench4b.log
echo "=== bench cache-hit done rc=$? ($(date +%H:%M)) ==="
cat /tmp/r3_bench4b.json
echo "V10 ALL DONE $(date +%H:%M)"
