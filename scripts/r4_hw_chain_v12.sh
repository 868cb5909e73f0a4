#!/bin/bash
# Round-4 hardware chain v12: the Aug-20 VM restore wiped the compile
# cache, the procedural dataset, every checkpoint, and (again) the
# evidence logs chain v11 was re-producing. This chain restores them in
# value order:
#   1  default bench.py -> fresh headline AND the phase-tail pipeline
#      evidence (HN_SEG_PHASE_TAIL is default-ON; the log records the
#      in-pipeline number docs/DESIGN.md + KNOBS cite)
#   2  phase-tail standalone pair bench (KNOBS citation)
#   3  score-bias tiered-certificate bench (DESIGN 8 citation)
#   4  fine-tuning convergence demo (VERDICT #8 — the only round-3 ask
#      with NO surviving evidence): 13 epochs = JOINT 0-6, LANE 7-8,
#      DET 9-10, SEG 11-12; per-epoch JSONL rows land incrementally and
#      the step auto-resumes from the newest checkpoint, so a deadline
#      kill loses at most one epoch
#   5  (deadline-permitting) bs16 artifact export + C-ABI batched run
# Steps skip themselves if their artifact already has a result; the
# chain stands down at DEADLINE_UTC so the driver's round-end bench.py
# can claim the relay. Stop early: touch /tmp/stop_chain.
set -u
set -o pipefail
cd "$(dirname "$0")/.."

DEADLINE_UTC="${DEADLINE_UTC:-0542}"  # HHMM; no new step after this

rm -f /tmp/stop_chain
echo "=== chain v12 start $(date -u +%H:%M:%S) ==="

# seconds until the deadline (for per-step timeouts); 0 if already past
secs_left() {
  local now tgt
  now=$(date -u +%s)
  tgt=$(date -u -d "today ${DEADLINE_UTC:0:2}:${DEADLINE_UTC:2:2}" +%s)
  if [ "$tgt" -le "$now" ]; then echo 0; else echo $((tgt - now)); fi
}

guard() {
  # settle delay: a back-to-back step start can race the previous
  # process's relay-claim release and wedge on a dead RPC. Claims
  # expire in ~1-2 min; 90 s between steps is cheap insurance.
  sleep 90
  if [ -f /tmp/stop_chain ]; then
    echo "=== stop_chain seen, aborting before: $1 ==="
    exit 0
  fi
  if [ "$(secs_left)" -lt 120 ]; then
    echo "=== past deadline $DEADLINE_UTC, standing down before: $1 ==="
    exit 0
  fi
  echo "--- $1 $(date -u +%H:%M:%S) ---"
}

have_result() { grep -q '"value"\|ms/frame' "$1" 2>/dev/null; }

guard "[1/5] bench.py default (headline + phase-tail pipeline cell)"
if have_result artifacts/bench_phase_tail_pipeline_r4.log; then
  echo "already landed, skipping"
else
  { echo "# default pipeline run; HN_SEG_PHASE_TAIL unset = ON (the";
    echo "# default since chain v6) — this IS the phase-tail-on cell.";
    timeout 2400 python bench.py 2>&1; } \
    | tee artifacts/bench_phase_tail_pipeline_r4.log | tail -2
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[2/5] phase-tail standalone pair bench"
if grep -q "ms" artifacts/bench_phase_tail_r4.log 2>/dev/null; then
  echo "already landed, skipping"
else
  timeout 2400 python scripts/bench_phase_tail.py 2>&1 \
    | tee artifacts/bench_phase_tail_r4.log | grep -v WARNING | tail -8
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[3/5] bench.py score-bias tiered certificate"
if have_result artifacts/bench_scorebias_tiered_r4.log; then
  echo "already landed, skipping"
else
  HN_SCORE_BIAS=-0.35 timeout 2400 python bench.py 2>&1 \
    | tee artifacts/bench_scorebias_tiered_r4.log | tail -2
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[4/5] fine-tuning convergence (13 ep: JOINT 7 + LANE/DET/SEG x2)"
T=$(secs_left)
timeout "$T" python scripts/train_convergence.py \
  --epochs 13 --fine-tuning --epoch-tuning 2 --auto-resume \
  --out artifacts/convergence_metrics_r4ft.jsonl 2>&1 \
  | tee -a artifacts/train_convergence_r4ft.log \
  | grep -E "EPOCH SUMMARY|EPOCH [0-9]+ [A-Z]+ TRAINING|auto-resume|retry"
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[5/5] bs16 export + C-ABI batched run"
if have_result artifacts/deploy_run_bs16_r4.log; then
  echo "already landed, skipping"
else
  if [ ! -f artifacts/deploy_bs16/artifact.json ]; then
    timeout "$(secs_left)" python -m hydranet_tpu.demo \
      --deploy artifacts/deploy_bs16 --batch 16 2>&1 | tail -2
    sleep 90
  fi
  IMG=artifacts/fixtures/bench_frame_1080p.jpg
  env AXON_POOL_SVC_OVERRIDE=127.0.0.1 TPU_WORKER_HOSTNAMES=localhost \
    AXON_COMPAT_VERSION=49 AXON_LOOPBACK_RELAY=1 \
    PJRT_LIBRARY_PATH=/opt/axon/libaxon_pjrt.so \
    HN_PJRT_CLIENT_OPTIONS='remote_compile=1;local_only=0;priority=0;topology=str:v5e:1x1x1;n_slices=1;session_id=str:hydranet-demo-r4s4;rank=4294967295' \
    timeout "$(secs_left)" ./deploy/build/hydranet_demo \
    artifacts/deploy_bs16 4 "$IMG" 2>&1 \
    | tee artifacts/deploy_run_bs16_r4.log | tail -6
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "=== chain v12 done $(date -u +%H:%M:%S) ==="
