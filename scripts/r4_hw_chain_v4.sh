#!/bin/bash
# Round-4 hardware chain v4 (needs chain v3's convergence checkpoint):
#   1) export flagship bs16 + bs1 artifacts (BASELINE config 4 / config 3)
#   2) drive them through the C ABI demo (mode 4: batched protocol with
#      h2d / device-execute / d2h decomposition) — VERDICT item 3
#   3) bench.py on the trained convergence checkpoint (item 6)
#   4) bench.py score-density stress cell at the headline config (item 6)
set -u
cd "$(dirname "$0")/.."
echo "=== chain v4 start $(date -u +%H:%M:%S) ==="

echo "--- [0a] fused phase-tail standalone ---"
timeout 3600 python scripts/bench_phase_tail.py 2>&1 | tee artifacts/bench_phase_tail_r4.log | grep -v WARNING
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "--- [0b] bench.py with HN_SEG_PHASE_TAIL=1 ---"
HN_SEG_PHASE_TAIL=1 timeout 1800 python bench.py 2>&1 | tee artifacts/bench_phase_tail_pipeline_r4.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

IMG=artifacts/fixtures/bench_frame_1080p.jpg

echo "--- [1/5] export bs16 + bs1 artifacts ---"
timeout 3600 python -m hydranet_tpu.demo --deploy artifacts/deploy_bs16 --batch 16 2>&1 | tail -2
timeout 1800 python -m hydranet_tpu.demo --deploy artifacts/deploy_bs1 --batch 1 2>&1 | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

DEPLOY_ENV="AXON_POOL_SVC_OVERRIDE=127.0.0.1 TPU_WORKER_HOSTNAMES=localhost AXON_COMPAT_VERSION=49 AXON_LOOPBACK_RELAY=1 PJRT_LIBRARY_PATH=/opt/axon/libaxon_pjrt.so"
CLIENT_OPTS='remote_compile=1;local_only=0;priority=0;topology=str:v5e:1x1x1;n_slices=1;session_id=str:hydranet-demo-r4;rank=4294967295'

echo "--- [2/5] C ABI batched run bs16 ---"
env $DEPLOY_ENV HN_PJRT_CLIENT_OPTIONS="$CLIENT_OPTS" \
  timeout 3600 ./deploy/build/hydranet_demo artifacts/deploy_bs16 4 "$IMG" \
  2>&1 | tee artifacts/deploy_run_bs16_r4.log | tail -6
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "--- [3/5] C ABI batched-protocol run bs1 (decomposition) ---"
env $DEPLOY_ENV HN_PJRT_CLIENT_OPTIONS="$CLIENT_OPTS" \
  timeout 1800 ./deploy/build/hydranet_demo artifacts/deploy_bs1 4 "$IMG" \
  2>&1 | tee artifacts/deploy_run_bs1_r4.log | tail -6
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

CKPT=$(python - <<'EOF'
import glob, os
cands = []
for d in glob.glob("artifacts/convergence_logs/*/model/epoch_*"):
    cands.append((os.path.getmtime(d), int(d.rsplit("_", 1)[1]), d))
print(max(cands)[2] if cands else "")
EOF
)
echo "--- [4/5] bench.py trained ckpt ($CKPT, convergence preset) ---"
if [ -n "$CKPT" ]; then
  HN_CONFIG=configs/hydranet_convergence_procedural.yml HN_CKPT="$CKPT" \
    timeout 1800 python bench.py 2>&1 | tee artifacts/bench_ckpt_r4.log | tail -2
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "--- [5/5] bench.py score-density stress (headline config) ---"
HN_SCORE_BIAS=-0.35 timeout 1800 python bench.py 2>&1 | tee artifacts/bench_scorebias_r4.log | tail -2
echo "--- exit: $? $(date -u +%H:%M:%S) ---"

echo "=== chain v4 done $(date -u +%H:%M:%S) ==="
