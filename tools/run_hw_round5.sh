#!/bin/bash
# Round-5 hardware queue (VERDICT round-4 "next round" items #1/#3/#4/#6/#8):
#   1. bench.py headline sanity at HEAD.
#   2. batch_sweep — batch-vs-fps/chip for ViT-L/ViT-S x bf16/int8+qkv x
#      scan/k=6-unroll (item #1, the untouched multiplier on the metric).
#   3. flash_tune --xl — the XL attention variant grid + no-softmax ablation
#      that prices the VPU bill at N=10405/18497 (item #3).
#   4. bench_sizes ladder (scan + unroll) at HEAD — one-session family/ladder
#      table (item #4; the flash kernel changed since 4h, so recompiles).
#   5. bench_families — BEiT-L-512 + SwinV2-L-384 at HEAD (item #4).
#   6. window_ab — SwinV2 window kernel vs XLA, per-op + e2e toggle (item #6).
#   7. measure_int8_tiers --swinv2-only — the MLP-only tier's number (item #8).
#   8. measure_int8_tiers --vitl-only + --giant-only — HEAD int8 rows so the
#      one-session table includes the giant (~30 min build + GB upload).
# Ordered most-valuable-first in case the tunnel dies mid-queue.
# Nominal ~2.5h; worst case ~7h with budgets.
OUT=${1:-/tmp/hw_round5}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

if ! wait_for_backend; then
  echo "=== ABORT: backend unreachable at queue start $(date)" | tee -a "$OUT/summary.log"
  exit 1
fi

step bench_headline 1200 python bench.py
step batch_sweep 5400 python tools/batch_sweep.py
step bench_batch8 1200 python bench.py --batch 8
step flash_xl_variants 4200 python tools/flash_tune.py --xl 10405 18497
step sizes_scan 3600 python tools/bench_sizes.py 756 1036 1428 1904
step sizes_unroll 4800 python tools/bench_sizes.py --unroll 756 1036 1428 1904
step bench_families 2400 python tools/bench_families.py
step window_ab 2700 python tools/window_ab.py
step int8_swinv2 1800 python tools/measure_int8_tiers.py --swinv2-only
step int8_vitl 2400 python tools/measure_int8_tiers.py --vitl-only
step int8_giant 7200 python tools/measure_int8_tiers.py --giant-only

echo "=== done $(date). Fold: batch knee -> docs+serving guide; XL variant verdict; one-session family table; window-kernel A/B row; swin int8 note." | tee -a "$OUT/summary.log"
