#!/bin/bash
# Round-4 hardware chain v6: relaunch of everything the VM restart killed
# (chain v3 step 4 + all of v4 + all of v5), fast verdicts first.
# Stop early with: touch /tmp/stop_chain
set -u
cd "$(dirname "$0")/.."
echo "=== chain v6 start $(date -u +%H:%M:%S) ==="

guard() {
  if [ -f /tmp/stop_chain ]; then
    echo "=== stop_chain seen, aborting before: $1 ==="
    exit 0
  fi
  echo "--- $1 $(date -u +%H:%M:%S) ---"
}

guard "[1/9] fused phase-tail standalone"
timeout 3600 python scripts/bench_phase_tail.py 2>&1 \
  | tee artifacts/bench_phase_tail_r4.log | grep -v WARNING
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[2/9] bench.py with HN_SEG_PHASE_TAIL=1 (on top of wpack default)"
HN_SEG_PHASE_TAIL=1 timeout 1800 python bench.py 2>&1 \
  | tee artifacts/bench_phase_tail_pipeline_r4.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[3/9] bench.py score-density stress (headline config)"
HN_SCORE_BIAS=-0.35 timeout 1800 python bench.py 2>&1 \
  | tee artifacts/bench_scorebias_r4.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

IMG=artifacts/fixtures/bench_frame_1080p.jpg

guard "[4/9] export bs16 + bs1 artifacts"
timeout 3600 python -m hydranet_tpu.demo --deploy artifacts/deploy_bs16 --batch 16 2>&1 | tail -2
timeout 1800 python -m hydranet_tpu.demo --deploy artifacts/deploy_bs1 --batch 1 2>&1 | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

DEPLOY_ENV="AXON_POOL_SVC_OVERRIDE=127.0.0.1 TPU_WORKER_HOSTNAMES=localhost AXON_COMPAT_VERSION=49 AXON_LOOPBACK_RELAY=1 PJRT_LIBRARY_PATH=/opt/axon/libaxon_pjrt.so"
CLIENT_OPTS='remote_compile=1;local_only=0;priority=0;topology=str:v5e:1x1x1;n_slices=1;session_id=str:hydranet-demo-r4;rank=4294967295'

guard "[5/9] C ABI batched run bs16"
env $DEPLOY_ENV HN_PJRT_CLIENT_OPTIONS="$CLIENT_OPTS" \
  timeout 3600 ./deploy/build/hydranet_demo artifacts/deploy_bs16 4 "$IMG" \
  2>&1 | tee artifacts/deploy_run_bs16_r4.log | tail -8
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[6/9] C ABI batched-protocol run bs1 (h2d/exec/d2h decomposition)"
env $DEPLOY_ENV HN_PJRT_CLIENT_OPTIONS="$CLIENT_OPTS" \
  timeout 1800 ./deploy/build/hydranet_demo artifacts/deploy_bs1 4 "$IMG" \
  2>&1 | tee artifacts/deploy_run_bs1_r4.log | tail -8
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[7/9] profile_train bs128 (remat defaults, base only)"
BENCH_TRAIN_BATCH=128 timeout 7200 python scripts/profile_train.py --base-only \
  2>&1 | tee artifacts/profile_train_bs128_r4.log | grep -v WARNING
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

guard "[8/9] convergence + fine-tuning (24 epochs, from scratch — ckpts wiped)"
timeout 16000 python scripts/train_convergence.py --epochs 24 --fine-tuning \
  --out artifacts/convergence_metrics_r4.jsonl \
  2>&1 | tee artifacts/train_convergence_r4.log \
  | grep -E "EPOCH SUMMARY|TRAINING|PHASE|resumed|retry|done"
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

CKPT=$(python - <<'EOF'
import glob, os
cands = []
for d in glob.glob("artifacts/convergence_logs/*/model/epoch_*"):
    cands.append((os.path.getmtime(d), int(d.rsplit("_", 1)[1]), d))
print(max(cands)[2] if cands else "")
EOF
)
guard "[9/9] bench.py trained ckpt ($CKPT, convergence preset)"
if [ -n "$CKPT" ]; then
  HN_CONFIG=configs/hydranet_convergence_procedural.yml HN_CKPT="$CKPT" \
    timeout 1800 python bench.py 2>&1 | tee artifacts/bench_ckpt_r4.log | tail -2
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "=== chain v6 done $(date -u +%H:%M:%S) ==="
