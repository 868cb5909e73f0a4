#!/bin/bash
# Round-4 hardware chain v2:
#   1) entry() compile check (verify surface, post spatial-hint changes)
#   2) bench.py — headline re-check after this round's model-code edits
#   3) bench_seg_stages — attribute the seg head's 52 ms (2.43x roofline)
#      per decoder stage, so the optimization target is named
#   4) bench_train with the PACKED phase CE (item 4) vs control
set -u
cd "$(dirname "$0")/.."
echo "=== chain v2 start $(date -u +%H:%M:%S) ==="

echo "--- [1/5] entry compile check ---"
timeout 600 python __graft_entry__.py 2>&1 | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "--- [2/5] bench.py headline ---"
timeout 1800 python bench.py 2>&1 | tee artifacts/bench_r4_check.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "--- [3/5] bench_seg_stages bs128 ---"
timeout 3600 python scripts/bench_seg_stages.py 2>&1 | tee artifacts/bench_seg_stages_r4.log
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "--- [4/5] bench_train packed phase CE (bs128 remat defaults) ---"
HN_PHASE_LOSS=1 timeout 3600 python bench_train.py 2>&1 | tee artifacts/bench_train_packed_phase_r4.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "--- [5/5] bench_train control ---"
timeout 3600 python bench_train.py 2>&1 | tee artifacts/bench_train_control_r4.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "=== chain v2 done $(date -u +%H:%M:%S) ==="
