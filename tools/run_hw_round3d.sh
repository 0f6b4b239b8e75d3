#!/bin/bash
# Round-3d hardware measurement queue: quantify the row-mask kernel
# optimization end-to-end, probe the int8 MXU rates, and sweep the
# experimental int8-QK^T kernel. Run AFTER tools/run_hw_backlog.sh finishes
# (the TPU is exclusive-access). Same step/probe discipline as the backlog.
OUT=${1:-/tmp/hw_r3d}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

step int8_probe    600  python tools/int8_mxu_probe.py
step bench         1800 python bench.py
step sizes_scan    1800 python tools/bench_sizes.py 1036 1428 1904
step flash_int8    2400 python tools/flash_tune.py --int8 5477 10405 18497
step sizes_unroll_xl 4200 python tools/bench_sizes.py --unroll 1428 1904
step tpu_sanity    2400 python tools/tpu_sanity.py

echo "=== done $(date). Fold into docs/performance.md + ROUND3_NOTES.md." | tee -a "$OUT/summary.log"
