#!/bin/bash
# Round-5h: chip A/B for the batch-aware window-kernel gate (a351555).
# Round-5f measured SwinV2-L-384 REGRESSING under batch (6.36 -> 7.24/6.87
# ms/frame at B=1/4/8) with the per-image nW >= 8 gate, which left the tail
# stages on XLA at every batch; the gate now dispatches on b*nW (the
# kernel's true grid). Re-measure the same three rows — B=1 must reproduce
# 6.36 (identical dispatch), B=4/8 tell whether the kernel turns batch into
# a win for SwinV2 or the regression is elsewhere (layout/merge reshapes).
OUT=${1:-/tmp/hw_round5h}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

PREV_PID_FILE=${PREV_PID_FILE:-/tmp/hw5g.pid}
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

step swin_batch_gate 2400 python tools/bench_families.py swinv2 --batch=1,4,8

echo "=== done $(date). Fold: SwinV2 batch rows with the b*nW gate." | tee -a "$OUT/summary.log"
