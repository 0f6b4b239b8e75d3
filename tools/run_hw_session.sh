#!/bin/bash
# Session hardware queue (round-3 backlog, re-runnable at HEAD).
# Priority-ordered: headline + sanity gates first, then the measurements that
# quantify the round-3d kernel work, then int8 tiers. Worst case the full
# queue is ~4.5h of step budgets (nominal ~2h); the headline gates are
# front-loaded so short tunnel windows still capture bench + families +
# sanity. Bounded-step / probe-on-timeout discipline from hw_step_lib.sh.
OUT=${1:-/tmp/hw_session}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

step bench          1500 python bench.py
step families       1200 python tools/bench_families.py
step sizes_scan     1800 python tools/bench_sizes.py 1036 1428 1904
step tpu_sanity     2400 python tools/tpu_sanity.py
step int8_probe     600  python tools/int8_mxu_probe.py
step flash_int8     1800 python tools/flash_tune.py --int8 5477 10405
step int8_vitl      1800 python tools/measure_int8_tiers.py --vitl-only
step flash_cutover  1500 python tools/flash_tune.py 2917 3250 4097
step sizes_unroll   3000 python tools/bench_sizes.py --unroll 756 1036

echo "=== done $(date). Fold into docs/performance.md + ROUND3_NOTES.md." | tee -a "$OUT/summary.log"
