#!/bin/bash
# Round-5e (closing session): finish the cut-off 1428-unroll row and extend
# the batched-serving axis beyond DA@518 — the round-5 batch work measured
# B=8 as the knee for DA ViT-L/S at 504^2 only; this session prices batch
# for the non-DA families, the XL ladder, and the giant:
#   1. sizes_1428_unroll — the row the previous session's cutoff ate
#      (scan@HEAD read 190.29 ms; pre-hpp4 unroll was 194.21).
#   2. families_batch — BEiT-L-512 + SwinV2-L-384 at B in {1,4,8}
#      (batched semantics pinned by tests/test_batched_inference.py).
#   3. batch_ladder — ViT-L scan at 756/1036 with B in {2,4,8}.
#   4. batch_1428 — ViT-L scan at 1428 with B in {2,4} (XL batch headroom).
#   5. giant_batch — DA ViT-Giant bf16 + int8+qkv, scan, B in {1,4,8}
#      (~30 min synthetic build + ~2.5 GB upload; LAST so a wedge here
#      cannot eat the cheaper rows).
OUT=${1:-/tmp/hw_round5e}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

if ! wait_for_backend; then
  echo "=== ABORT: backend unreachable at queue start $(date)" | tee -a "$OUT/summary.log"
  exit 1
fi

step sizes_1428_unroll 2400 python tools/bench_sizes.py --unroll 1428
step families_batch 2400 python tools/bench_families.py --batch=1,4,8
step batch_ladder 2400 python tools/bench_sizes.py --batch=2,4,8 756 1036
step batch_1428 1800 python tools/bench_sizes.py --batch=2,4 1428
step giant_batch 7200 python tools/batch_sweep.py --models giant --scan-only --batches 1 4 8

echo "=== done $(date). Fold: 1428-unroll row; batched family/ladder/giant tables." | tee -a "$OUT/summary.log"
