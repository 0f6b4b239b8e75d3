#!/bin/bash
# Round-4j queue: the giant full-neck int8 tier — the ONE unmeasured claim
# left in docs/performance.md's int8 section. The full-neck extension's
# structural win case is the ViT-Giant (its all-1536 neck is ~8.5 ms of the
# 30.5 ms int8+qkv e2e; round-3 analysis), but only ViT-L tiers were ever
# measured on hardware (round-4a, /tmp/hw_session/int8_vitl.log) and at
# ViT-L scale the neck tier measured NEGATIVE (-3%). This run decides the
# serving guidance ("--int8-full only for giant-class necks") with data.
# Budget: the giant's synthetic build is ~25-30 min host-side, params are
# ~2.5 GB/copy over the tunnel, 3 tiers => allow 2h.
OUT=${1:-/tmp/hw_round4j}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

if ! wait_for_backend; then
  echo "=== ABORT: backend unreachable at queue start $(date)" | tee -a "$OUT/summary.log"
  exit 1
fi

step int8_tiers_giant 7200 python tools/measure_int8_tiers.py --giant-only

echo "=== done $(date). Fold: giant bf16/int8+qkv/int8+qkv+neck rows => serving guidance." | tee -a "$OUT/summary.log"
