#!/bin/bash
# Session hardware queue (tunnel back up after the round-3b/3c/3d outage).
# Priority-ordered for a ~1h window: headline + sanity gates first, then the
# measurements that quantify the round-3d kernel work, then int8 tiers.
# Same bounded-step / probe-on-timeout discipline as run_hw_backlog.sh.
set -u
OUT=${1:-/tmp/hw_session}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

probe_backend() {
  timeout 90 python -c "import jax, numpy as np, jax.numpy as jnp; x=jnp.ones((4,)); assert float(np.asarray(x.sum()))==4.0" >/dev/null 2>&1
}

wait_for_backend() {
  for _ in $(seq 1 5); do
    probe_backend && return 0
    echo "    backend unreachable; cooling down 120s $(date)" | tee -a "$OUT/summary.log"
    sleep 120
  done
  return 1
}

step() {
  local name=$1 budget=$2; shift 2
  echo "=== $name (budget ${budget}s) $(date)" | tee -a "$OUT/summary.log"
  timeout --kill-after=30 "$budget" "$@" > "$OUT/$name.log" 2>&1
  local rc=$?
  echo "    rc=$rc $(date)" | tee -a "$OUT/summary.log"
  tail -3 "$OUT/$name.log" | sed 's/^/    /'
  if [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then
    echo "    step timed out — probing backend before continuing" | tee -a "$OUT/summary.log"
    if ! wait_for_backend; then
      echo "=== ABORT: backend still unreachable after cooldown $(date)" | tee -a "$OUT/summary.log"
      exit 1
    fi
    echo "    backend recovered $(date)" | tee -a "$OUT/summary.log"
  fi
}

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
