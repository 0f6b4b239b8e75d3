#!/bin/bash
# Round-5g: the last unmeasured int8 row — BEiT-L-512 tiers on chip (the
# tier fully supports the stacked-blocks BEiT encoder and is CPU-tested,
# but every chip timing row so far was DA/SwinV2) — plus a closing
# headline bench at round-5 HEAD. Waits on the 5f queue's PID before
# touching the exclusive chip.
OUT=${1:-/tmp/hw_round5g}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

PREV_PID_FILE=${PREV_PID_FILE:-/tmp/hw5f.pid}
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

step beit_int8 2400 python tools/measure_int8_tiers.py --beit-only
step bench_head 1200 python bench.py

echo "=== done $(date). Fold: BEiT int8 tier rows; confirm headline." | tee -a "$OUT/summary.log"
