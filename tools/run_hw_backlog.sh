#!/bin/bash
# One-command hardware measurement backlog (run when the axon tunnel is up).
# Produces /tmp/hw_backlog/*.log; each step is independently time-bounded and
# failures don't stop later steps. Ordering: cheap validation first, the
# giant build (longest, ~90 min budget per memory notes) last.
set -u
OUT=${1:-/tmp/hw_backlog}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

step() {
  local name=$1 budget=$2; shift 2
  echo "=== $name (budget ${budget}s) $(date)" | tee -a "$OUT/summary.log"
  timeout "$budget" "$@" > "$OUT/$name.log" 2>&1
  echo "    rc=$? $(date)" | tee -a "$OUT/summary.log"
  tail -3 "$OUT/$name.log" | sed 's/^/    /'
}

step bench         1800 python bench.py
step tpu_sanity    2400 python tools/tpu_sanity.py
step sizes_unroll  3000 python tools/bench_sizes.py --unroll 756 1036
step int8_vitl     1800 python tools/measure_int8_tiers.py --vitl-only
step int8_giant    7200 python tools/measure_int8_tiers.py --giant-only

echo "=== done $(date). Update docs/performance.md + ROUND3_NOTES.md with these numbers." | tee -a "$OUT/summary.log"
