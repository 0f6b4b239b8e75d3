#!/bin/bash
# Round-5d: validate the promoted hpp=4 XL dispatch on the chip.
#   1. hpp4_probe — device-compile + execute at the window bounds (the
#      18497 failure was device-compile-time; export lowering can't pin
#      the HPP4_MAX_NPAD ceiling, only the chip can).
#   2. flash_tune --xl 5477 10405 — the anchor at 10405 IS the production
#      kernel, now upgraded: expect ~5.23 ms (live confirmation); the
#      hpp=4 row at 5477 decides whether the window floor can drop to
#      cover 1036^2.
#   3. bench_sizes 1428 — e2e with the wiring (pre-wiring same-session
#      row: 196.44 ms scan / 194.21 unroll).
#   4. tpu_sanity — the full hardware gate at round-5 HEAD.
OUT=${1:-/tmp/hw_round5d}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

if ! wait_for_backend; then
  echo "=== ABORT: backend unreachable at queue start $(date)" | tee -a "$OUT/summary.log"
  exit 1
fi

step hpp4_probe 2400 python tools/hpp4_probe.py
step flash_xl_floor 2400 python tools/flash_tune.py --xl 5477 10405
step sizes_1428 1800 python tools/bench_sizes.py 1428
step tpu_sanity 5400 python tools/tpu_sanity.py

echo "=== done $(date). Fold: hpp4 window bounds + e2e delta; sanity gate." | tee -a "$OUT/summary.log"
