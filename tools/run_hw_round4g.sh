#!/bin/bash
# Round-4g queue: (1) per-op profile of the fusion/head tail at 1428/1904
# with the banded/gather resize candidates (tools/profile_head.py), (2) the
# k=6 unroll serving mode at the two largest ladder sizes (4f only measured
# unroll at 756/1036; "wins at every size it compiles for" needs the 1428/
# 1904 datapoints before the ladder can claim unroll there). Run AFTER the
# staged-kernel sweep (flash_tune --staged-only) releases the chip.
OUT=${1:-/tmp/hw_round4g}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

if ! wait_for_backend; then
  echo "=== ABORT: backend unreachable at queue start $(date)" | tee -a "$OUT/summary.log"
  exit 1
fi

step profile_head 2400 python tools/profile_head.py 1428 1904
step sizes_unroll_xl 4200 python tools/bench_sizes.py --unroll 1428 1904

echo "=== done $(date). Decide: banded resize wiring + unroll ladder rows." | tee -a "$OUT/summary.log"
