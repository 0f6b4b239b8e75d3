#!/bin/bash
# Round-4b validation queue: the one-pass serving cutover just shipped
# (ONE_PASS_MAX_KV 2048 -> 32768, VMEM-gated fused-qkv dispatch) — re-gate
# the kernels on hardware, re-measure the size ladder end to end, and re-run
# the two D=64 contraction probes with the DCE-proof chain harness.
OUT=${1:-/tmp/hw_round4b}
mkdir -p "$OUT"
cd "$(dirname "$0")/.."
source tools/hw_step_lib.sh

step tpu_sanity   2400 python tools/tpu_sanity.py
step sizes_scan   2400 python tools/bench_sizes.py 756 1036 1428 1904
step bench        1500 python bench.py
step sizes_unroll 3000 python tools/bench_sizes.py --unroll 756 1036
step headpack     900  python tools/headpack_probe.py
step int8_probe   1200 python tools/int8_mxu_probe.py
step families     1200 python tools/bench_families.py
step profile_1428 1500 python tools/profile_split.py 1428
step unroll_knee  2400 python tools/scan_unroll_curve.py --ks 1 6 full --interleave 3

echo "=== done $(date). Fold into docs/performance.md + ROUND4_NOTES.md." | tee -a "$OUT/summary.log"
