#!/bin/bash
# Round-4d queue: measure the q-blocked fused-qkv cutover (f10b253) — the
# fused zero-transpose kernel now serves every one-pass N, so the whole DA
# ladder changes dispatch — plus the re-fixed 1428 profile.
OUT=${1:-/tmp/hw_round4d}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

if ! wait_for_backend; then
  echo "=== ABORT: backend unreachable at queue start $(date)" | tee -a "$OUT/summary.log"
  exit 1
fi

step tpu_sanity   2400 python tools/tpu_sanity.py
step flash_sweep  4800 python tools/flash_tune.py --int8 2917 5477 10405 18497
step sizes_scan   2400 python tools/bench_sizes.py 756 1036 1428 1904
step sizes_unroll 3000 python tools/bench_sizes.py --unroll 756 1036
step bench        1500 python bench.py
step profile_1428 1500 python tools/profile_split.py 1428
step profile_1036 1500 python tools/profile_split.py 1036

echo "=== done $(date). Fold into docs/performance.md + ROUND4_NOTES.md." | tee -a "$OUT/summary.log"
