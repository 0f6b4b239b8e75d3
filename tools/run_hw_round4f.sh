#!/bin/bash
# Round-4f queue: validate the FIXED q-blocked fused-qkv kernel (a4bf25d) on
# hardware — the 4d run proved the shipped path failed Mosaic lowering at
# every >=756px size (dynamic_slice on a value) — plus the k=6 partial-unroll
# serving default and the now-lowering int8-QK^T fused sweep.
OUT=${1:-/tmp/hw_round4f}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

if ! wait_for_backend; then
  echo "=== ABORT: backend unreachable at queue start $(date)" | tee -a "$OUT/summary.log"
  exit 1
fi

step bench        1500 python bench.py
step sizes_scan   2400 python tools/bench_sizes.py 756 1036 1428 1904
step sizes_unroll 3000 python tools/bench_sizes.py --unroll 756 1036
step profile_1428 1500 python tools/profile_split.py 1428
step profile_1036 1500 python tools/profile_split.py 1036
step flash_sweep  4800 python tools/flash_tune.py --int8 2917 5477 10405 18497
step tpu_sanity   2400 python tools/tpu_sanity.py

echo "=== done $(date). Fold into docs/performance.md + ROUND4_NOTES.md." | tee -a "$OUT/summary.log"
