#!/bin/bash
# Round-3 hardware chain v7: v6 steps 2..12 (v6 was stopped by sentinel
# after its profile step so the backward drill-down could run; this
# resumes from the convergence run). Steps renumbered in comments only.
cd /root/repo || exit 1
rm -f /tmp/stop_chain

stop_check() {
  if [ -f /tmp/stop_chain ]; then
    echo "[chain7] stop sentinel found — exiting at $(date)"
    exit 0
  fi
}

echo "[chain7] waiting for TPU tunnel, probing every 60s ($(date))"
while true; do
  stop_check
  if timeout 180 python -c "import jax; d=jax.devices(); assert d and d[0].platform != 'cpu'" >/dev/null 2>&1; then
    break
  fi
  sleep 60
done
echo "[chain7] TPU up at $(date); letting the probe's relay claim expire"
sleep 100

echo "[chain7] 2/12 convergence run (40 epochs, lane_weight 1.0, precise-BN, eval thr 0.05)"
timeout 10800 python -u scripts/train_convergence.py \
  --out artifacts/convergence_metrics_r3b.jsonl \
  > artifacts/train_convergence_r3b.log 2>&1
echo "[chain7] convergence exit=$? at $(date)"
sleep 100; stop_check

echo "[chain7] 3/12 PTQ accuracy+speed study on the trained checkpoint"
timeout 5400 python -u scripts/ptq_study.py --bench \
  > artifacts/ptq_study_hw.log 2>&1
echo "[chain7] ptq_study exit=$? at $(date)"
sleep 100; stop_check

echo "[chain7] 4/12 demo overlays from the trained checkpoint"
CKPT=$(python - <<'EOF'
import sys
sys.path.insert(0, "scripts")
from train_convergence import latest_checkpoint
print(latest_checkpoint("artifacts/convergence_logs"))
EOF
)
echo "[chain7] ckpt: $CKPT"
if [ -n "$CKPT" ]; then
  mkdir -p /tmp/demo_val_imgs
  # list entries are repo-relative paths (images/... under the data root)
  head -8 artifacts/procedural_data/list/valid.txt | while read -r p; do
    cp "$p" /tmp/demo_val_imgs/ || true
  done
  timeout 1800 python -u -m hydranet_tpu.demo \
    --config configs/hydranet_convergence_procedural.yml \
    --checkpoint "$CKPT" \
    --images /tmp/demo_val_imgs \
    --out artifacts/demo_overlays_r3 \
    > artifacts/demo_overlays_r3.log 2>&1
  echo "[chain7] demo exit=$? at $(date)"
fi
sleep 100; stop_check

CKARG=""
[ -n "$CKPT" ] && CKARG="--checkpoint $CKPT"

echo "[chain7] 5/12 deploy artifacts (float + int8) from the trained checkpoint"
timeout 2400 python -u -m hydranet_tpu.demo \
  --config configs/hydranet_convergence_procedural.yml $CKARG \
  --deploy /tmp/artifact_float > artifacts/deploy_export_float.log 2>&1
echo "[chain7] float export exit=$?"
sleep 100
timeout 2400 python -u -m hydranet_tpu.demo \
  --config configs/hydranet_convergence_procedural.yml $CKARG \
  --deploy /tmp/artifact_int8 --quant int8 --calib-frames 8 \
  --calib-images artifacts/procedural_data/images \
  > artifacts/deploy_export_int8.log 2>&1
echo "[chain7] int8 export exit=$?"
sleep 100; stop_check

echo "[chain7] 6/12 C++ PJRT demo on both artifacts"
IMG=$(head -1 artifacts/procedural_data/list/valid.txt)   # repo-relative
[ -f "$IMG" ] || IMG=$(ls artifacts/procedural_data/images/*.jpg | head -1)
ENV_COMMON="AXON_POOL_SVC_OVERRIDE=127.0.0.1 TPU_WORKER_HOSTNAMES=localhost \
AXON_COMPAT_VERSION=49 AXON_LOOPBACK_RELAY=1 \
PJRT_LIBRARY_PATH=/opt/axon/libaxon_pjrt.so"
env $ENV_COMMON \
  HN_PJRT_CLIENT_OPTIONS="remote_compile=1;local_only=0;priority=0;topology=str:v5e:1x1x1;n_slices=1;session_id=str:hydranet-post-f;rank=4294967295" \
  timeout 2400 ./deploy/build/hydranet_demo /tmp/artifact_float 1 "$IMG" \
  /tmp/deploy_float_out.png > artifacts/deploy_run_float.log 2>&1
echo "[chain7] float C++ run exit=$?"
sleep 100
env $ENV_COMMON \
  HN_PJRT_CLIENT_OPTIONS="remote_compile=1;local_only=0;priority=0;topology=str:v5e:1x1x1;n_slices=1;session_id=str:hydranet-post-q;rank=4294967295" \
  timeout 2400 ./deploy/build/hydranet_demo /tmp/artifact_int8 1 "$IMG" \
  /tmp/deploy_int8_out.png > artifacts/deploy_run_int8.log 2>&1
echo "[chain7] int8 C++ run exit=$?"
sleep 100; stop_check

echo "[chain7] 7/12 executable-cache proof (warm rerun of the float artifact)"
if [ -f /tmp/artifact_float/module.mlir ]; then
  ls -la /tmp/artifact_float/executable.cache 2>/dev/null \
    || echo "[chain7] note: no cache file written by the cold run"
  env $ENV_COMMON \
    HN_PJRT_CLIENT_OPTIONS="remote_compile=1;local_only=0;priority=0;topology=str:v5e:1x1x1;n_slices=1;session_id=str:hydranet-cacheproof;rank=4294967295" \
    timeout 2400 ./deploy/build/hydranet_demo /tmp/artifact_float 1 "$IMG" \
    /tmp/deploy_cached_out.png > artifacts/deploy_run_float_cached.log 2>&1
  echo "[chain7] warm run exit=$?"
  grep -E "cache hit|loaded .* pipeline in" artifacts/deploy_run_float_cached.log
fi
sleep 100; stop_check

echo "[chain7] 8/12 seg-final variants standalone (incl. pallas kernel)"
BENCH_BATCH=128 timeout 2400 python -u scripts/bench_seg_final_v2.py \
  > artifacts/bench_seg_final_v2_hw.log 2>&1
echo "[chain7] seg-final exit=$? at $(date)"
sleep 100; stop_check

echo "[chain7] 9/12 in-pipeline bench with HN_PALLAS_SEGFINAL=1"
HN_PALLAS_SEGFINAL=1 timeout 1800 python -u bench.py \
  > artifacts/bench_segfinal_pallas.log 2>&1
echo "[chain7] pallas-bench exit=$? at $(date)"
sleep 100; stop_check

echo "[chain7] 10/12 int8-PTQ bench"
HN_QUANT=int8 timeout 2400 python -u bench.py > artifacts/bench_int8.log 2>&1
echo "[chain7] int8-bench exit=$? at $(date)"
sleep 100; stop_check

echo "[chain7] 11/12 Pallas-neck in-pipeline bench + serving soak + train sweep"
HN_PALLAS_NECK=1 timeout 1800 python -u bench.py \
  > artifacts/bench_neck_pallas.log 2>&1
echo "[chain7] neck-bench exit=$? at $(date)"
sleep 100
timeout 3600 python -u scripts/soak_serving.py 200 \
  > artifacts/soak_serving_r3.log 2>&1
echo "[chain7] soak exit=$? at $(date)"
sleep 100
timeout 5400 python -u bench_train.py --sweep > artifacts/bench_train_sweep_r3.log 2>&1
echo "[chain7] sweep exit=$? at $(date)"
sleep 100; stop_check

echo "[chain7] 12/12 best-combo bench: union of kernel flags that"
echo "          individually beat the fresh baseline (quant excluded —"
echo "          it changes accuracy, not just speed)"
COMBO=$(python - <<'EOF'
import json
def fps(path):
    try:
        for line in open(path):
            if '"value"' in line:
                return json.loads(line[line.index("{"):])["value"]
    except Exception:
        return None
base = fps("artifacts/bench_r3.log")
flags = []
for flag, log in [("HN_PALLAS_SEGFINAL", "artifacts/bench_segfinal_pallas.log"),
                  ("HN_PALLAS_NECK", "artifacts/bench_neck_pallas.log")]:
    v = fps(log)
    if base and v and v > base:
        flags.append(f"{flag}=1")
print(" ".join(flags))
EOF
)
echo "[chain7] combo flags: '$COMBO'"
if [ -n "$COMBO" ]; then
  env $COMBO timeout 1800 python -u bench.py \
    > artifacts/bench_best_combo.log 2>&1
  echo "[chain7] combo-bench exit=$? at $(date)"
fi
echo "[chain7] ALL DONE at $(date)"
