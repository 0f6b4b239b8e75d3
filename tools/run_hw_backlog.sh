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
set -u
OUT=${1:-/tmp/hw_backlog}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."

probe_backend() {
  timeout 90 python -c "import jax, numpy as np, jax.numpy as jnp; x=jnp.ones((4,)); assert float(np.asarray(x.sum()))==4.0" >/dev/null 2>&1
}

wait_for_backend() {
  # Up to ~35 min of 90s probes with 120s gaps (wedges clear in ~30 min).
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

step bench         1800 python bench.py
step tpu_sanity    2400 python tools/tpu_sanity.py
step sizes_unroll  3000 python tools/bench_sizes.py --unroll 756 1036
step int8_vitl     1800 python tools/measure_int8_tiers.py --vitl-only
step flash_cutover 1500 python tools/flash_tune.py 2917 3250 4097
step int8_giant    7200 python tools/measure_int8_tiers.py --giant-only

echo "=== done $(date). Update docs/performance.md + ROUND3_NOTES.md with these numbers." | tee -a "$OUT/summary.log"
