#!/bin/bash
# Round-4c queue: re-run the steps the round-4b session lost or measured with
# stale probe code. (4b's profile_1428 died RESOURCE_EXHAUSTED when a second
# queue instance briefly contended for the exclusive chip; headpack/int8
# ran before the max-fold hardening; unroll_knee never started.)
OUT=${1:-/tmp/hw_round4c}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

# the chip may be wedged by the killed contender — probe before burning budgets
if ! wait_for_backend; then
  echo "=== ABORT: backend unreachable at queue start $(date)" | tee -a "$OUT/summary.log"
  exit 1
fi

step headpack     1200 python tools/headpack_probe.py
step int8_probe   1800 python tools/int8_mxu_probe.py
step profile_1428 1500 python tools/profile_split.py 1428
step unroll_knee  2400 python tools/scan_unroll_curve.py --ks 1 6 full --interleave 3

echo "=== done $(date). Fold into docs/performance.md + ROUND4_NOTES.md." | tee -a "$OUT/summary.log"
