#!/bin/bash
# Round-4 hardware chain v10: post-convergence mop-up, in value order.
# Launch AFTER v9 is stopped/done (waits on its pid). Steps:
#   1  score-density stress with the TIERED certificate — owed: the v9
#      cell wedged on a dead tunnel RPC and hit its timeout (exit 124)
#      without ever dispatching. Completes the DESIGN.md §8 A/B vs the
#      929.61 fps flat-certificate record.
#   2  bench_matrix configs 1-4 under current defaults (v9 step 7 if
#      v9 was stopped early)
#   3  soak 200x128 (v9 step 8 ditto)
# Each step is skipped if its artifact already has a result line, and
# the whole chain stands down at DEADLINE_UTC so the driver's round-end
# bench.py can claim the relay. Stop early: touch /tmp/stop_chain.
set -u
set -o pipefail
cd "$(dirname "$0")/.."

DEADLINE_UTC="${DEADLINE_UTC:-0250}"  # HHMM; no new step after this

if [ -f /tmp/r4chain9.pid ]; then
  V9=$(cat /tmp/r4chain9.pid)
  echo "=== v10 waiting on v9 (pid $V9) $(date -u +%H:%M:%S) ==="
  while kill -0 "$V9" 2>/dev/null; do sleep 30; done
fi
rm -f /tmp/stop_chain
echo "=== chain v10 start $(date -u +%H:%M:%S) ==="

guard() {
  # settle delay: a back-to-back step start can race the previous
  # process's relay-claim release and wedge on a dead RPC (v9 step 4
  # did exactly that — 30 min at zero CPU, exit 124). Claims expire in
  # ~1-2 min; waiting 90 s between steps is cheap insurance.
  sleep 90
  if [ -f /tmp/stop_chain ]; then
    echo "=== stop_chain seen, aborting before: $1 ==="
    exit 0
  fi
  if [ "$(date -u +%H%M)" \> "$DEADLINE_UTC" ] \
     && [ "$(date -u +%H%M)" \< "2000" ]; then
    echo "=== past deadline $DEADLINE_UTC, standing down before: $1 ==="
    exit 0
  fi
  echo "--- $1 $(date -u +%H:%M:%S) ---"
}

have_result() { grep -q '"value"' "$1" 2>/dev/null; }

guard "[1/3] bench.py score-bias tiered certificate"
if have_result artifacts/bench_scorebias_tiered_r4.log; then
  echo "already landed, skipping"
else
  HN_SCORE_BIAS=-0.35 timeout 2400 python bench.py 2>&1 \
    | tee artifacts/bench_scorebias_tiered_r4.log | tail -2
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[2/3] bench_matrix (configs 1-4, current defaults)"
if have_result artifacts/bench_matrix_r4.log; then
  echo "already landed, skipping"
else
  BENCH_SKIP_TRAIN=1 timeout 5400 python bench_matrix.py 2>&1 \
    | tee artifacts/bench_matrix_r4.log | grep -E '^\{'
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[3/3] soak 200x128 (current defaults)"
if have_result artifacts/soak_serving_r4.log; then
  echo "already landed, skipping"
else
  timeout 3600 python scripts/soak_serving.py 2>&1 \
    | tee artifacts/soak_serving_r4.log | tail -3
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "=== chain v10 done $(date -u +%H:%M:%S) ==="
