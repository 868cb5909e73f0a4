#!/bin/bash
# Round-4 hardware chain v8: waits for chain v7, then refreshes the
# README matrix numbers (bs1 configs are round-2 vintage) and the soak
# under the current defaults (wpack + phase tail + tiered certificate).
# Stop early with: touch /tmp/stop_chain
set -u
set -o pipefail
cd "$(dirname "$0")/.."
echo "=== chain v8 queued $(date -u +%H:%M:%S), waiting for v7 ==="

V7PID=$(cat /tmp/r4chain7.pid 2>/dev/null || echo "")
while [ -n "$V7PID" ] && kill -0 "$V7PID" 2>/dev/null; do
  if [ -f /tmp/stop_chain ]; then
    echo "=== stop_chain seen while waiting, aborting ==="
    exit 0
  fi
  sleep 60
done
echo "=== chain v8 start $(date -u +%H:%M:%S) ==="

guard() {
  if [ -f /tmp/stop_chain ]; then
    echo "=== stop_chain seen, aborting before: $1 ==="
    exit 0
  fi
  echo "--- $1 $(date -u +%H:%M:%S) ---"
}

guard "[1/2] bench_matrix (configs 1-4, current defaults)"
BENCH_SKIP_TRAIN=1 timeout 5400 python bench_matrix.py 2>&1 \
  | tee artifacts/bench_matrix_r4.log | grep -E '^\{'
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[2/2] soak 200x128 (current defaults)"
timeout 3600 python scripts/soak_serving.py 2>&1 \
  | tee artifacts/soak_serving_r4.log | tail -3
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "=== chain v8 done $(date -u +%H:%M:%S) ==="
