#!/bin/bash
# Round-5j: per-op + e2e attribution for the batch-aware window-kernel gate
# at B=8 (follows the 5h e2e rows): window_ab --batch 8 prices each stage's
# kernel-vs-XLA at the batched grid product, so the b*nW >= 8 threshold is
# set by data rather than extrapolated from the B=1 ladder.
OUT=${1:-/tmp/hw_round5j}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

PREV_PID_FILE=${PREV_PID_FILE:-/tmp/hw5i.pid}
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

step window_ab_b8 2400 python tools/window_ab.py --batch 8

echo "=== done $(date)." | tee -a "$OUT/summary.log"
