#!/bin/bash
# Round-5 closing hardware queue (the /tmp wipe ate the first queue's
# unfolded logs — this re-runs everything still owed to the docs, at HEAD,
# in ONE session so the family table finally has a single vintage):
#   1. bench headline at the new B=8 default + the batch-1 latency row.
#   2. bench_families — BEiT-L-512 + SwinV2-L-384 at HEAD (VERDICT item #4);
#      SwinV2 now runs the nW>=8 window-kernel dispatch gate e2e.
#   3. window_ab — per-stage kernel-vs-XLA rows for the docs table + the e2e
#      toggle (VERDICT item #6; the round-5a numbers lived only in /tmp).
#   4. int8 tiers: SwinV2 MLP-only row (item #8), ViT-L HEAD rows, giant last
#      (~30 min build) so a tunnel death costs the least-valuable step.
#   5. DA ViT-S rows via batch_sweep --models vits (completes the family set).
#   6. sizes ladder scan + unroll (HEAD vintage for the README ladder).
#   7. flash_tune --xl 10405 — the hpp=4 reproduction run gating its wiring.
# Ordered most-valuable-first in case the tunnel dies mid-queue.
OUT=${1:-/tmp/hw_round5c}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

if ! wait_for_backend; then
  echo "=== ABORT: backend unreachable at queue start $(date)" | tee -a "$OUT/summary.log"
  exit 1
fi

step bench_headline 1800 python bench.py
step bench_batch1 1200 python bench.py --batch 1
step bench_families 2400 python tools/bench_families.py
step window_ab 2700 python tools/window_ab.py
step int8_swinv2 1800 python tools/measure_int8_tiers.py --swinv2-only
step int8_vitl 2400 python tools/measure_int8_tiers.py --vitl-only
step vits_rows 2400 python tools/batch_sweep.py --models vits --batches 1 8
step sizes_scan 3600 python tools/bench_sizes.py 756 1036 1428 1904
step hpp4_confirm 1800 python tools/flash_tune.py --xl 10405
step sizes_unroll 4800 python tools/bench_sizes.py --unroll 756 1036 1428 1904
step int8_giant 7200 python tools/measure_int8_tiers.py --giant-only

echo "=== done $(date). Fold: HEAD family table + ladder; window A/B rows; swin/vitl/giant int8 rows; hpp4 verdict." | tee -a "$OUT/summary.log"
