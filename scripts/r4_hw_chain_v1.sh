#!/bin/bash
# Round-4 hardware chain v1:
#   1) roofline of the bs128 serving pipeline (VERDICT r4 item 1)
#   2) seg-final Pallas sweep with the fixed tie-aware gate (item 2)
# Sequential: one TPU, shared compile cache.
set -u
cd "$(dirname "$0")/.."
echo "=== chain v1 start $(date -u +%H:%M:%S) ==="

echo "--- [1/2] roofline_serving bs128 ---"
timeout 3600 python scripts/roofline_serving.py 2>&1 | tee artifacts/roofline_r4.log
echo "--- [1/2] exit: $? $(date -u +%H:%M:%S) ---"

echo "--- [2/2] bench_seg_final_v2 sweep ---"
timeout 3600 python scripts/bench_seg_final_v2.py 2>&1 | tee artifacts/bench_seg_final_v2_r4b.log
echo "--- [2/2] exit: $? $(date -u +%H:%M:%S) ---"

echo "=== chain v1 done $(date -u +%H:%M:%S) ==="
