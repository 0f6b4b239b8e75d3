# Shared harness for the hardware measurement queue scripts
# (run_hw_session.sh / run_hw_backlog.sh / run_hw_round3d.sh).
#
# The TPU is exclusive-access behind a flaky relayed tunnel (CLAUDE.md): a
# step killed by its budget (rc=124/137) very likely wedged the backend, and
# running the remaining steps immediately would burn their full budgets
# against a dead tunnel. After a timeout we probe with a short bounded check
# and only continue once it answers; wedges clear in ~30 min, so the default
# is 10 probes with 120 s gaps (~35 min). Override with WAIT_RETRIES.
#
# Usage:  OUT=/tmp/wherever ; mkdir -p "$OUT" ; source tools/hw_step_lib.sh
#         step <name> <budget_s> <command...>
set -u
WAIT_RETRIES=${WAIT_RETRIES:-10}

probe_backend() {
  # --kill-after matters: a probe wedged in axon device init ignores SIGTERM
  # (stuck in C code), and plain `timeout` waits forever after TERM — the
  # whole cooldown loop then hangs on one probe.
  timeout --kill-after=15 90 python -c "import jax, numpy as np, jax.numpy as jnp; x=jnp.ones((4,)); assert float(np.asarray(x.sum()))==4.0" >/dev/null 2>&1
}

wait_for_backend() {
  for _ in $(seq 1 "$WAIT_RETRIES"); do
    probe_backend && return 0
    echo "    backend unreachable; cooling down 120s $(date)" | tee -a "$OUT/summary.log"
    sleep 120
  done
  return 1
}

step() {
  # Retries (STEP_RETRIES, default 2 extra attempts) cover the two transient
  # failure shapes this backend shows after a wedge window (round-5e/5g):
  # RESOURCE_EXHAUSTED on the first big allocation even though the tiny
  # probe passes, and "backend unreachable" surfacing inside the tool.
  local name=$1 budget=$2; shift 2
  local attempts=$(( ${STEP_RETRIES:-2} + 1 )) rc=0 try
  for try in $(seq 1 "$attempts"); do
    echo "=== $name (budget ${budget}s, try $try/$attempts) $(date)" | tee -a "$OUT/summary.log"
    timeout --kill-after=30 "$budget" "$@" > "$OUT/$name.log" 2>&1
    rc=$?
    echo "    rc=$rc $(date)" | tee -a "$OUT/summary.log"
    tail -3 "$OUT/$name.log" | sed 's/^/    /'
    if [ "$rc" -eq 124 ] || [ "$rc" -eq 137 ]; then
      echo "    step timed out — probing backend before continuing" | tee -a "$OUT/summary.log"
      if ! wait_for_backend; then
        echo "=== ABORT: backend still unreachable after cooldown $(date)" | tee -a "$OUT/summary.log"
        exit 1
      fi
      echo "    backend recovered $(date)" | tee -a "$OUT/summary.log"
      return "$rc"  # budget consumed; do not retry a timed-out step
    fi
    [ "$rc" -eq 0 ] && return 0
    if grep -aq "RESOURCE_EXHAUSTED\|backend unreachable" "$OUT/$name.log"; then
      echo "    transient backend failure — cooling down before retry" | tee -a "$OUT/summary.log"
      sleep 120
      wait_for_backend || { echo "=== ABORT: backend unreachable $(date)" | tee -a "$OUT/summary.log"; exit 1; }
    else
      return "$rc"  # real tool failure; retrying won't help
    fi
  done
  return "$rc"
}
