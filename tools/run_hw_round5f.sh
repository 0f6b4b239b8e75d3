#!/bin/bash
# Round-5f: re-run the one step round-5e lost — families_batch died at its
# first warm-up readback with a transient RESOURCE_EXHAUSTED right after the
# 1428^2 unroll step released the chip (/tmp/hw_round5e/families_batch.log);
# bench_families now cools down + retries per batch. Waits for the 5e queue
# (PID file) to exit before touching the exclusive-access chip.
OUT=${1:-/tmp/hw_round5f}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

PREV_PID_FILE=${PREV_PID_FILE:-/tmp/hw5e.pid}
if [ -f "$PREV_PID_FILE" ]; then
  prev=$(cat "$PREV_PID_FILE")
  while kill -0 "$prev" 2>/dev/null; do
    echo "    waiting for previous queue (pid $prev) $(date)" >> "$OUT/summary.log"
    sleep 60
  done
fi

if ! wait_for_backend; then
  echo "=== ABORT: backend unreachable at queue start $(date)" | tee -a "$OUT/summary.log"
  exit 1
fi

step families_batch 3600 python tools/bench_families.py --batch=1,4,8

echo "=== done $(date). Fold: batched BEiT/SwinV2 family rows." | tee -a "$OUT/summary.log"
