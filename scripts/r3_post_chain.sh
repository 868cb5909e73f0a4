#!/bin/bash
# Round-3 post-chain: after r3_hw_chain_all.sh finishes (relay free, trained
# checkpoint on disk), demonstrate the C++ PJRT deploy path consuming both
# the float and the int8-PTQ artifacts exported from that checkpoint, with
# the reference demo's 10-warmup + 20-timed protocol.
cd /root/repo || exit 1
CHAIN_PID=$(cat /tmp/r3chain.pid 2>/dev/null)
if [ -n "$CHAIN_PID" ]; then
  echo "[post] waiting for chain pid $CHAIN_PID"
  while kill -0 "$CHAIN_PID" 2>/dev/null; do sleep 60; done
fi
echo "[post] chain done at $(date); letting its relay claim expire"
sleep 120

CKPT=$(python - <<'EOF'
import sys
sys.path.insert(0, "scripts")
from train_convergence import latest_checkpoint
print(latest_checkpoint("artifacts/convergence_logs"))
EOF
)
echo "[post] ckpt: $CKPT"
CKARG=""
[ -n "$CKPT" ] && CKARG="--checkpoint $CKPT"

echo "[post] 1/4 export float artifact"
timeout 2400 python -u -m hydranet_tpu.demo \
  --config configs/hydranet_convergence_procedural.yml $CKARG \
  --deploy /tmp/artifact_float > artifacts/deploy_export_float.log 2>&1
echo "[post] float export exit=$?"
sleep 100

echo "[post] 2/4 export int8 artifact (calibrated on procedural train images)"
timeout 2400 python -u -m hydranet_tpu.demo \
  --config configs/hydranet_convergence_procedural.yml $CKARG \
  --deploy /tmp/artifact_int8 --quant int8 --calib-frames 8 \
  --calib-images artifacts/procedural_data/images \
  > artifacts/deploy_export_int8.log 2>&1
echo "[post] int8 export exit=$?"
sleep 100

IMG=$(head -1 artifacts/procedural_data/list/valid.txt)
IMG="artifacts/procedural_data/$IMG"
[ -f "$IMG" ] || IMG=$(ls artifacts/procedural_data/images/*.jpg | head -1)
ENV_COMMON="AXON_POOL_SVC_OVERRIDE=127.0.0.1 TPU_WORKER_HOSTNAMES=localhost \
AXON_COMPAT_VERSION=49 AXON_LOOPBACK_RELAY=1 \
PJRT_LIBRARY_PATH=/opt/axon/libaxon_pjrt.so"

echo "[post] 3/4 C++ demo on float artifact ($IMG)"
env $ENV_COMMON \
  HN_PJRT_CLIENT_OPTIONS="remote_compile=1;local_only=0;priority=0;topology=str:v5e:1x1x1;n_slices=1;session_id=str:hydranet-post-f;rank=4294967295" \
  timeout 2400 ./deploy/build/hydranet_demo /tmp/artifact_float 1 "$IMG" \
  /tmp/deploy_float_out.png > artifacts/deploy_run_float.log 2>&1
echo "[post] float run exit=$?"
sleep 100

echo "[post] 4/4 C++ demo on int8 artifact"
env $ENV_COMMON \
  HN_PJRT_CLIENT_OPTIONS="remote_compile=1;local_only=0;priority=0;topology=str:v5e:1x1x1;n_slices=1;session_id=str:hydranet-post-q;rank=4294967295" \
  timeout 2400 ./deploy/build/hydranet_demo /tmp/artifact_int8 1 "$IMG" \
  /tmp/deploy_int8_out.png > artifacts/deploy_run_int8.log 2>&1
echo "[post] int8 run exit=$?"
echo "[post] ALL DONE at $(date)"
