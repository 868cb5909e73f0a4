#!/bin/bash
# Round-4 hardware chain v7: waits for chain v6 (convergence + ckpt bench)
# to finish, then runs the train-side wpack-CE A/B (the round's key train
# verdict), finishes the convergence run if v6's 16000s timeout cut it
# before the SEG fine-tuning phase (epochs 22-23 of 24), and records a
# fresh default headline. Stop early with: touch /tmp/stop_chain
set -u
set -o pipefail  # '--- exit ---' lines record timeout/python, not tee/tail
cd "$(dirname "$0")/.."
echo "=== chain v7 queued $(date -u +%H:%M:%S), waiting for v6 ==="

V6PID=$(cat /tmp/r4chain6.pid 2>/dev/null || echo "")
while [ -n "$V6PID" ] && kill -0 "$V6PID" 2>/dev/null; do
  if [ -f /tmp/stop_chain ]; then
    echo "=== stop_chain seen while waiting, aborting ==="
    exit 0
  fi
  sleep 60
done
echo "=== chain v7 start $(date -u +%H:%M:%S) ==="

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

guard "[1/6] bench_train wpack CE g=6 (bs128 remat defaults)"
HN_WPACK_LOSS=6 timeout 4000 python bench_train.py 2>&1 \
  | tee artifacts/bench_train_wpack_r4.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[2/6] bench_train control (same conditions)"
timeout 4000 python bench_train.py 2>&1 \
  | tee artifacts/bench_train_control_r4.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[3/6] bench.py score-density stress with the TIERED certificate (vs 929.61)"
HN_SCORE_BIAS=-0.35 timeout 1800 python bench.py 2>&1 \
  | tee artifacts/bench_scorebias_tiered_r4.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

LAST_EPOCH=$(python - <<'EOF'
import json
last = -1
try:
    for line in open("artifacts/convergence_metrics_r4.jsonl"):
        try:
            last = max(last, json.loads(line)["epoch"])
        except Exception:
            pass
except FileNotFoundError:
    pass
print(last)
EOF
)
RESUME=$(latest_ckpt)
if [ "$LAST_EPOCH" -lt 23 ] && [ "$LAST_EPOCH" -ge 10 ] && [ -n "$RESUME" ]; then
  guard "[4/6] resume convergence from $RESUME (last jsonl epoch $LAST_EPOCH < 23) to finish the SEG phase"
  timeout 5400 python scripts/train_convergence.py --epochs 24 --fine-tuning \
    --resume "$RESUME" \
    --out artifacts/convergence_metrics_r4.jsonl \
    2>&1 | tee -a artifacts/train_convergence_r4.log \
    | grep -E "EPOCH SUMMARY|TRAINING|resumed|retry|done"
  echo "--- exit: $? $(date -u +%H:%M:%S) ---"

  CKPT=$(latest_ckpt)
  guard "[5/6] bench.py trained ckpt after full fine-tuning ($CKPT)"
  if [ -n "$CKPT" ]; then
    HN_CONFIG=configs/hydranet_convergence_procedural.yml HN_CKPT="$CKPT" \
      timeout 1800 python bench.py 2>&1 | tee artifacts/bench_ckpt_r4b.log | tail -2
  fi
  echo "--- exit: $? $(date -u +%H:%M:%S) ---"
fi

guard "[6/6] bench.py fresh defaults (wpack + phase tail on)"
timeout 1800 python bench.py 2>&1 \
  | tee artifacts/bench_defaults_r4s2.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "=== chain v7 done $(date -u +%H:%M:%S) ==="
