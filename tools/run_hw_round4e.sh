#!/bin/bash
# Round-4e: confirm the unroll-knee verdict with the FIXED tool (the earlier
# "full" rows silently measured scan mode — True == 1 footgun). If k=6 >=
# true full unroll in the same interleaved process, k=6 becomes the serving
# default (3x faster cold compile, equal-or-better throughput).
OUT=${1:-/tmp/hw_round4e}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

if ! wait_for_backend; then
  echo "=== ABORT: backend unreachable at queue start $(date)" | tee -a "$OUT/summary.log"
  exit 1
fi

step unroll_confirm 3000 python tools/scan_unroll_curve.py --ks 1 6 12 full --interleave 3

echo "=== done $(date)." | tee -a "$OUT/summary.log"
