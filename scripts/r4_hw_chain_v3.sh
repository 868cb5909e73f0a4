#!/bin/bash
# Round-4 hardware chain v3:
#   1) W-packed seg-final sweep (roofline fix candidate)
#   2) in-pipeline bench with the packed formulation (g=6)
#   3) int8 latency-mode sweep bs1-16 (VERDICT item 7)
#   4) convergence training WITH the fine-tuning schedule (items 6+8),
#      24 epochs (18 joint + 2 LANE + 2 DET + 2 SEG) — longest job last
set -u
cd "$(dirname "$0")/.."
echo "=== chain v3 start $(date -u +%H:%M:%S) ==="

echo "--- [1/4] bench_wpack sweep ---"
timeout 3600 python scripts/bench_wpack.py 2>&1 | tee artifacts/bench_wpack_r4.log
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "--- [2/4] bench.py with HN_SEGFINAL_WPACK=6 ---"
HN_SEGFINAL_WPACK=6 timeout 1800 python bench.py 2>&1 | tee artifacts/bench_wpack_pipeline_r4.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "--- [3/4] int8 latency sweep ---"
timeout 5400 python scripts/bench_int8_latency.py 2>&1 | tee artifacts/bench_int8_latency_r4.log
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "--- [4/4] convergence + fine-tuning (24 epochs) ---"
timeout 14000 python scripts/train_convergence.py --epochs 24 --fine-tuning \
  --out artifacts/convergence_metrics_r4.jsonl \
  2>&1 | tee artifacts/train_convergence_r4.log | grep -E "EPOCH SUMMARY|TRAINING|resumed|retry|done"
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "=== chain v3 done $(date -u +%H:%M:%S) ==="
