#!/bin/bash
# Round-4 hardware chain v11: post-convergence mop-up (replaces v10),
# re-producing the evidence logs the VM restarts deleted plus the owed
# A/B cells, in value order:
#   1  score-density stress with the TIERED certificate — the v9 cell
#      wedged on a dead tunnel RPC (exit 124, zero dispatches); this
#      completes the DESIGN.md §8 A/B vs the 929.61 fps flat-cert record
#   2  export flagship bs16 + bs1 artifacts (the /tmp exports are gone)
#   3  C-ABI mode-4 batched runs on both (VERDICT #3 evidence:
#      deploy_run_bs16_r4.log / deploy_run_bs1_r4.log were wiped)
#   4  phase-tail evidence: standalone pair bench + HN_SEG_PHASE_TAIL=0
#      control pipeline cell (the v4 logs cited by KNOBS were wiped;
#      default is ON now, so the control is =0)
#   5  bench_matrix configs 1-4 under current defaults
#   6  soak 200x128
# Steps skip themselves if their artifact already has a result; the
# chain stands down at DEADLINE_UTC so the driver's round-end bench.py
# can claim the relay. Stop early: touch /tmp/stop_chain.
set -u
set -o pipefail
cd "$(dirname "$0")/.."

DEADLINE_UTC="${DEADLINE_UTC:-0250}"  # HHMM; no new step after this

if [ -f /tmp/r4chain9.pid ]; then
  V9=$(cat /tmp/r4chain9.pid)
  echo "=== v11 waiting on v9 (pid $V9) $(date -u +%H:%M:%S) ==="
  while kill -0 "$V9" 2>/dev/null; do sleep 30; done
fi
rm -f /tmp/stop_chain
echo "=== chain v11 start $(date -u +%H:%M:%S) ==="

guard() {
  # settle delay: a back-to-back step start can race the previous
  # process's relay-claim release and wedge on a dead RPC (v9 step 4
  # did exactly that — 30 min at zero CPU, exit 124). Claims expire in
  # ~1-2 min; 90 s between steps is cheap insurance.
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

have_result() { grep -q '"value"\|ms/frame' "$1" 2>/dev/null; }

guard "[1/6] bench.py score-bias tiered certificate"
if have_result artifacts/bench_scorebias_tiered_r4.log; then
  echo "already landed, skipping"
else
  HN_SCORE_BIAS=-0.35 timeout 2400 python bench.py 2>&1 \
    | tee artifacts/bench_scorebias_tiered_r4.log | tail -2
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[2/6] export bs16 + bs1 artifacts"
if [ -f artifacts/deploy_bs16/artifact.json ] \
   && [ -f artifacts/deploy_bs1/artifact.json ]; then
  echo "already exported, skipping"
else
  timeout 3600 python -m hydranet_tpu.demo \
    --deploy artifacts/deploy_bs16 --batch 16 2>&1 | tail -2
  sleep 90
  timeout 1800 python -m hydranet_tpu.demo \
    --deploy artifacts/deploy_bs1 --batch 1 2>&1 | tail -2
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

IMG=artifacts/fixtures/bench_frame_1080p.jpg
DEPLOY_ENV="AXON_POOL_SVC_OVERRIDE=127.0.0.1 TPU_WORKER_HOSTNAMES=localhost AXON_COMPAT_VERSION=49 AXON_LOOPBACK_RELAY=1 PJRT_LIBRARY_PATH=/opt/axon/libaxon_pjrt.so"
CLIENT_OPTS='remote_compile=1;local_only=0;priority=0;topology=str:v5e:1x1x1;n_slices=1;session_id=str:hydranet-demo-r4s3;rank=4294967295'

guard "[3a/6] C ABI batched run bs16 (mode 4)"
if have_result artifacts/deploy_run_bs16_r4.log; then
  echo "already landed, skipping"
else
  env $DEPLOY_ENV HN_PJRT_CLIENT_OPTIONS="$CLIENT_OPTS" \
    timeout 3600 ./deploy/build/hydranet_demo artifacts/deploy_bs16 4 \
    "$IMG" 2>&1 | tee artifacts/deploy_run_bs16_r4.log | tail -6
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[3b/6] C ABI batched-protocol run bs1 (decomposition)"
if have_result artifacts/deploy_run_bs1_r4.log; then
  echo "already landed, skipping"
else
  env $DEPLOY_ENV HN_PJRT_CLIENT_OPTIONS="$CLIENT_OPTS" \
    timeout 1800 ./deploy/build/hydranet_demo artifacts/deploy_bs1 4 \
    "$IMG" 2>&1 | tee artifacts/deploy_run_bs1_r4.log | tail -6
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[4a/6] phase-tail standalone pair bench"
if grep -q "ms" artifacts/bench_phase_tail_r4.log 2>/dev/null; then
  echo "already landed, skipping"
else
  timeout 3600 python scripts/bench_phase_tail.py 2>&1 \
    | tee artifacts/bench_phase_tail_r4.log | grep -v WARNING | tail -8
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[4b/6] bench.py HN_SEG_PHASE_TAIL=0 control"
if have_result artifacts/bench_phase_tail_off_r4.log; then
  echo "already landed, skipping"
else
  HN_SEG_PHASE_TAIL=0 timeout 1800 python bench.py 2>&1 \
    | tee artifacts/bench_phase_tail_off_r4.log | tail -2
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[5/6] bench_matrix (configs 1-4, current defaults)"
if have_result artifacts/bench_matrix_r4.log; then
  echo "already landed, skipping"
else
  BENCH_SKIP_TRAIN=1 timeout 5400 python bench_matrix.py 2>&1 \
    | tee artifacts/bench_matrix_r4.log | grep -E '^\{'
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[6/6] soak 200x128 (current defaults)"
if have_result artifacts/soak_serving_r4.log; then
  echo "already landed, skipping"
else
  timeout 3600 python scripts/soak_serving.py 2>&1 \
    | tee artifacts/soak_serving_r4.log | tail -3
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "=== chain v11 done $(date -u +%H:%M:%S) ==="
