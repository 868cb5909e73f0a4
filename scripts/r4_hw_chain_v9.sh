#!/bin/bash
# Round-4 hardware chain v9: the VM restart killed chains v6-v8 before
# their artifacts landed (compile cache, procedural dataset and deploy
# build were wiped too). This chain re-runs everything still owed, in
# value order:
#   1-2  wpack-CE train A/B  (VERDICT #4 verdict: target >=280 samples/s)
#   3    fresh default headline (wpack + phase tail on)
#   4    score-density stress with the tiered certificate
#   5    convergence 24 epochs WITH --fine-tuning (VERDICT #8), from
#        scratch (ckpts wiped), auto-regenerates the dataset
#   6    bench.py on the fine-tuned checkpoint (VERDICT #6)
#   7    bench_matrix configs 1-4 under current defaults
#   8    soak 200x128
# Stop early with: touch /tmp/stop_chain
set -u
set -o pipefail  # '--- exit ---' lines record timeout/python, not tee/tail
cd "$(dirname "$0")/.."
echo "=== chain v9 start $(date -u +%H:%M:%S) ==="

guard() {
  if [ -f /tmp/stop_chain ]; then
    echo "=== stop_chain seen, aborting before: $1 ==="
    exit 0
  fi
  echo "--- $1 $(date -u +%H:%M:%S) ---"
}

latest_ckpt() {
  python - <<'EOF'
import glob, os
cands = []
for d in glob.glob("artifacts/convergence_logs/*/model/epoch_*"):
    cands.append((os.path.getmtime(d), int(d.rsplit("_", 1)[1]), d))
print(max(cands)[2] if cands else "")
EOF
}

guard "[1/8] bench_train wpack CE g=6 (bs128 remat defaults)"
HN_WPACK_LOSS=6 timeout 4000 python bench_train.py 2>&1 \
  | tee artifacts/bench_train_wpack_r4.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[2/8] bench_train control (same conditions)"
timeout 4000 python bench_train.py 2>&1 \
  | tee artifacts/bench_train_control_r4b.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[3/8] bench.py fresh defaults (wpack + phase tail on)"
timeout 1800 python bench.py 2>&1 \
  | tee artifacts/bench_defaults_r4s3.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[4/8] bench.py score-density stress with the TIERED certificate (vs 929.61 flat-cert)"
HN_SCORE_BIAS=-0.35 timeout 1800 python bench.py 2>&1 \
  | tee artifacts/bench_scorebias_tiered_r4.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[5/8] convergence + fine-tuning (24 epochs, from scratch - ckpts wiped)"
timeout 12000 python scripts/train_convergence.py --epochs 24 --fine-tuning \
  --out artifacts/convergence_metrics_r4.jsonl \
  2>&1 | tee artifacts/train_convergence_r4.log \
  | grep -E "EPOCH SUMMARY|TRAINING|resumed|retry|done|phase"
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

CKPT=$(latest_ckpt)
guard "[6/8] bench.py trained ckpt after fine-tuning ($CKPT)"
if [ -n "$CKPT" ]; then
  HN_CONFIG=configs/hydranet_convergence_procedural.yml HN_CKPT="$CKPT" \
    timeout 1800 python bench.py 2>&1 | tee artifacts/bench_ckpt_r4.log | tail -2
else
  echo "no checkpoint found, skipping ckpt bench" >&2
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[7/8] bench_matrix (configs 1-4, current defaults)"
BENCH_SKIP_TRAIN=1 timeout 5400 python bench_matrix.py 2>&1 \
  | tee artifacts/bench_matrix_r4.log | grep -E '^\{'
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[8/8] soak 200x128 (current defaults)"
timeout 3600 python scripts/soak_serving.py 2>&1 \
  | tee artifacts/soak_serving_r4.log | tail -3
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "=== chain v9 done $(date -u +%H:%M:%S) ==="
