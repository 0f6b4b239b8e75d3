#!/bin/bash
# Round-4h queue (after wiring the banded resize, commit 0684f83):
#   1. bench_sizes scan ladder at the banded-affected sizes — the e2e fold of
#      the round-4g profile wins (expect ~-8/-18 ms at 1428/1904 from the
#      head+fusion resizes).
#   2. the k=6 unroll ladder at 1428/1904 — round-4g's sizes_unroll_xl step
#      was killed when the session ended before it wrote a row.
#   3. profile_head with the FIXED whole-output fold (0684f83): honest
#      conv rows (the old single-pixel fold let XLA slice convs to ~0 ms)
#      + re-validation of banded-vs-dense under the new fold.
#   4. bench.py headline re-check (banded must not touch 504²: fusion map
#      288 < 384 keeps the dense path — confirm no regression).
# Nominal ~55 min; worst case ~3h with budgets.
OUT=${1:-/tmp/hw_round4h}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

if ! wait_for_backend; then
  echo "=== ABORT: backend unreachable at queue start $(date)" | tee -a "$OUT/summary.log"
  exit 1
fi

step sizes_scan_banded 3000 python tools/bench_sizes.py 1036 1428 1904
step sizes_unroll_xl 4200 python tools/bench_sizes.py --unroll 1428 1904
step profile_head_fixed 2400 python tools/profile_head.py 1428 1904
step bench_headline 900 python bench.py

echo "=== done $(date). Fold: ladder rows + honest conv verdict (shiftsum vs direct at XL)." | tee -a "$OUT/summary.log"
