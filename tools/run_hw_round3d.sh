#!/bin/bash
# Round-3d hardware measurement queue: quantify the row-mask kernel
# optimization end-to-end, probe the int8 MXU rates, and sweep the
# experimental int8-QK^T kernel. Run AFTER tools/run_hw_backlog.sh finishes
# (the TPU is exclusive-access). Same step/probe discipline as the backlog.
set -u
OUT=${1:-/tmp/hw_r3d}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

probe_backend() {
  timeout 90 python -c "import jax, numpy as np, jax.numpy as jnp; x=jnp.ones((4,)); assert float(np.asarray(x.sum()))==4.0" >/dev/null 2>&1
}

wait_for_backend() {
  for _ in $(seq 1 10); do
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

step int8_probe    600  python tools/int8_mxu_probe.py
step bench         1800 python bench.py
step sizes_scan    1800 python tools/bench_sizes.py 1036 1428 1904
step flash_int8    2400 python tools/flash_tune.py --int8 5477 10405 18497
step sizes_unroll_xl 4200 python tools/bench_sizes.py --unroll 1428 1904
step tpu_sanity    2400 python tools/tpu_sanity.py

echo "=== done $(date). Fold into docs/performance.md + ROUND3_NOTES.md." | tee -a "$OUT/summary.log"
