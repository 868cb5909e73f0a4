#!/bin/bash
# Round-4 hardware chain v5: attribute the bs128 train step (540 ms).
# Both phase-CE implementations measured ~233 vs 237 samples/s, so the
# full-res-logits theory of the seg backward is dead — this profile says
# where the time actually goes at the headline train batch.
set -u
cd "$(dirname "$0")/.."
echo "=== chain v5 start $(date -u +%H:%M:%S) ==="

echo "--- [1/2] profile_train bs128 (remat defaults, base only) ---"
BENCH_TRAIN_BATCH=128 timeout 7200 python scripts/profile_train.py --base-only \
  2>&1 | tee artifacts/profile_train_bs128_r4.log | grep -v WARNING
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "--- [2/2] profile_train bs128 packed phase CE (base only) ---"
HN_PHASE_LOSS=1 BENCH_TRAIN_BATCH=128 timeout 7200 python scripts/profile_train.py --base-only \
  2>&1 | tee artifacts/profile_train_bs128_phase_r4.log | grep -v WARNING
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "=== chain v5 done $(date -u +%H:%M:%S) ==="
