#!/bin/bash
# Round-4i queue:
#   1. profile_head retry at 1428/1904 — the 4h step crashed on a tunnel
#      hiccup before the 1428 fusion rows / all 1904 rows, AND its "dense"
#      row was calling the package resize_2d, which post-0684f83 dispatches
#      banded at these sizes (banded-vs-banded). The tool now inlines a true
#      dense einsum; this run is the first honest dense-vs-banded verdict
#      under the whole-output fold.
#   2. int8 ViT-L tiers at the XL ladder sizes — the 518-px verdict was
#      int8+qkv +28%; at 1036/1428 the attention share grows but the
#      projection/MLP matmul tail is still ~40 ms of the 1428 step, so the
#      tier may still pay. First int8 datapoint above 518 px.
# Nominal ~45 min; worst case ~2.3h with budgets.
OUT=${1:-/tmp/hw_round4i}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

if ! wait_for_backend; then
  echo "=== ABORT: backend unreachable at queue start $(date)" | tee -a "$OUT/summary.log"
  exit 1
fi

step profile_head_honest 2400 python tools/profile_head.py 1428 1904
step int8_tiers_xl 5400 python tools/measure_int8_tiers.py --vitl-only --sizes 518 1036 1428

echo "=== done $(date). Fold: dense-vs-banded verdict + int8 XL tier rows." | tee -a "$OUT/summary.log"
