#!/bin/bash
# Round-5i: re-run the rows the 5g queue lost to the post-wedge transient
# (BEiT int8 tiers; headline bench if 5g's also failed) with the hardened
# retrying step lib. Waits on the 5h queue's PID.
OUT=${1:-/tmp/hw_round5i}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

PREV_PID_FILE=${PREV_PID_FILE:-/tmp/hw5h.pid}
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
if ! grep -aq '"metric"' /tmp/hw_round5g/bench_head.log 2>/dev/null; then
  # budget > bench.py's own 1800s backend-probe budget + compile + measure
  step bench_head 3000 python bench.py
fi

echo "=== done $(date)." | tee -a "$OUT/summary.log"
