#!/bin/bash
# Round-4 hardware chain v7: waits for chain v6 (convergence + ckpt bench)
# to finish, then runs the train-side wpack-CE A/B and a fresh default
# headline. Stop early with: touch /tmp/stop_chain
set -u
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

guard "[1/3] bench_train wpack CE g=6 (bs128 remat defaults)"
HN_WPACK_LOSS=6 timeout 4000 python bench_train.py 2>&1 \
  | tee artifacts/bench_train_wpack_r4.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[2/3] bench_train control (same conditions)"
timeout 4000 python bench_train.py 2>&1 \
  | tee artifacts/bench_train_control_r4.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[3/3] bench.py fresh defaults (wpack + phase tail on)"
timeout 1800 python bench.py 2>&1 \
  | tee artifacts/bench_defaults_r4s2.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "=== chain v7 done $(date -u +%H:%M:%S) ==="
