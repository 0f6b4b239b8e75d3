#!/bin/bash
# Round-4 measurement queue: re-measure the one-pass/online cutover with the
# FIXED adaptive chain timer (the round-3 flash_tune used 3-vs-9 chains whose
# 6-op delta was below tunnel noise and printed impossible sub-roofline
# times), plus the two D=64 contraction probes and the scan-unroll curve.
# Nominal ~45 min; worst case ~2h of step budgets.
OUT=${1:-/tmp/hw_round4}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

step flash_sweep  3600 python tools/flash_tune.py 2917 5477 10405 18497
step headpack     900  python tools/headpack_probe.py
step int8_probe   1200 python tools/int8_mxu_probe.py
step unroll_curve 2400 python tools/scan_unroll_curve.py

echo "=== done $(date). Fold into docs/performance.md + ROUND4_NOTES.md." | tee -a "$OUT/summary.log"
