#!/bin/bash
# One-command hardware measurement backlog (run when the axon tunnel is up).
# Produces /tmp/hw_backlog/*.log; each step is independently time-bounded.
# Ordering: cheap validation first, the giant build (longest, ~90 min budget
# per memory notes) last.
#
# A step killed by its budget (rc=124/137) very likely wedged the exclusive
# TPU tunnel (see CLAUDE.md): running the remaining steps immediately would
# burn their full budgets against a dead backend. After a timeout we probe
# the backend with a short bounded check and only continue once it answers;
# if it stays unreachable for ~35 min we abort the rest.
OUT=${1:-/tmp/hw_backlog}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

step bench         1800 python bench.py
step tpu_sanity    2400 python tools/tpu_sanity.py
step sizes_unroll  3000 python tools/bench_sizes.py --unroll 756 1036
step int8_vitl     1800 python tools/measure_int8_tiers.py --vitl-only
step flash_cutover 1500 python tools/flash_tune.py 2917 3250 4097
step int8_giant    7200 python tools/measure_int8_tiers.py --giant-only

echo "=== done $(date). Update docs/performance.md + ROUND3_NOTES.md with these numbers." | tee -a "$OUT/summary.log"
