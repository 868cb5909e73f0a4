#!/bin/bash
# Round-3 hardware chain v4 (supersedes v2+v3, re-ordered by value per
# minute so the quick decision-making benches land first and the 3h
# convergence run follows): wait for the TPU tunnel, then run ALL pending
# hardware work one process at a time (the relay is single-claim; sleeps
# let each claim expire). `touch /tmp/stop_chain` halts it between steps
# (frees the relay for e.g. the driver's round-end bench.py).
cd /root/repo || exit 1
rm -f /tmp/stop_chain

stop_check() {
  if [ -f /tmp/stop_chain ]; then
    echo "[chain5] stop sentinel found — exiting at $(date)"
    exit 0
  fi
}

echo "[chain5] waiting for TPU tunnel, probing every 60s ($(date))"
while true; do
  stop_check
  if timeout 180 python -c "import jax; d=jax.devices(); assert d and d[0].platform != 'cpu'" >/dev/null 2>&1; then
    break
  fi
  sleep 60
done
echo "[chain5] TPU up at $(date); letting the probe's relay claim expire"
sleep 100

echo "[chain5] 1/15 fresh baseline bench"
timeout 1800 python -u bench.py > artifacts/bench_r3.log 2>&1
echo "[chain5] baseline-bench exit=$? at $(date)"
sleep 100; stop_check

echo "[chain5] 1b/15 fresh component stage mix (VERDICT item 10 re-rank)"
timeout 2400 python -u scripts/bench_components.py \
  > artifacts/bench_components_r3.log 2>&1
echo "[chain5] components exit=$? at $(date)"
sleep 100; stop_check

echo "[chain5] 2/15 det-tower standalone bench (XLA vs fused kernel)"
timeout 2400 python -u scripts/bench_det_tower.py \
  > artifacts/bench_det_tower.log 2>&1
echo "[chain5] det-tower exit=$? at $(date)"
sleep 100; stop_check

echo "[chain5] 3/15 in-pipeline bench with HN_PALLAS_TOWER=1"
HN_PALLAS_TOWER=1 timeout 1800 python -u bench.py \
  > artifacts/bench_tower_pallas.log 2>&1
echo "[chain5] tower-bench exit=$? at $(date)"
sleep 100; stop_check

echo "[chain5] 3b/15 tower+neck kernels combined (adjacency hypothesis:"
echo "          the neck kernel's r2 loss was consumer-side fusion, which"
echo "          a kernelized tower consumer changes)"
HN_PALLAS_TOWER=1 HN_PALLAS_NECK=1 timeout 1800 python -u bench.py \
  > artifacts/bench_tower_neck_pallas.log 2>&1
echo "[chain5] tower+neck exit=$? at $(date)"
sleep 100; stop_check

echo "[chain5] 4/15 train-step profile (bs64)"
timeout 5400 python -u scripts/profile_train.py > artifacts/profile_train_r3.log 2>&1
echo "[chain5] profile exit=$? at $(date)"
sleep 100; stop_check

echo "[chain5] 5/15 convergence run (40 epochs, lane_weight 1.0, precise-BN, eval thr 0.05)"
timeout 10800 python -u scripts/train_convergence.py \
  --out artifacts/convergence_metrics_r3b.jsonl \
  > artifacts/train_convergence_r3b.log 2>&1
echo "[chain5] convergence exit=$? at $(date)"
sleep 100; stop_check

echo "[chain5] 6/15 PTQ accuracy+speed study on the trained checkpoint"
timeout 5400 python -u scripts/ptq_study.py --bench \
  > artifacts/ptq_study_hw.log 2>&1
echo "[chain5] ptq_study exit=$? at $(date)"
sleep 100; stop_check

echo "[chain5] 7/15 demo overlays from the trained checkpoint"
CKPT=$(python - <<'EOF'
import sys
sys.path.insert(0, "scripts")
from train_convergence import latest_checkpoint
print(latest_checkpoint("artifacts/convergence_logs"))
EOF
)
echo "[chain5] ckpt: $CKPT"
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
  echo "[chain5] demo exit=$? at $(date)"
fi
sleep 100; stop_check

CKARG=""
[ -n "$CKPT" ] && CKARG="--checkpoint $CKPT"

echo "[chain5] 8/15 deploy artifacts (float + int8) from the trained checkpoint"
timeout 2400 python -u -m hydranet_tpu.demo \
  --config configs/hydranet_convergence_procedural.yml $CKARG \
  --deploy /tmp/artifact_float > artifacts/deploy_export_float.log 2>&1
echo "[chain5] float export exit=$?"
sleep 100
timeout 2400 python -u -m hydranet_tpu.demo \
  --config configs/hydranet_convergence_procedural.yml $CKARG \
  --deploy /tmp/artifact_int8 --quant int8 --calib-frames 8 \
  --calib-images artifacts/procedural_data/images \
  > artifacts/deploy_export_int8.log 2>&1
echo "[chain5] int8 export exit=$?"
sleep 100; stop_check

echo "[chain5] 9/15 C++ PJRT demo on both artifacts"
IMG=$(head -1 artifacts/procedural_data/list/valid.txt)   # repo-relative
[ -f "$IMG" ] || IMG=$(ls artifacts/procedural_data/images/*.jpg | head -1)
ENV_COMMON="AXON_POOL_SVC_OVERRIDE=127.0.0.1 TPU_WORKER_HOSTNAMES=localhost \
AXON_COMPAT_VERSION=49 AXON_LOOPBACK_RELAY=1 \
PJRT_LIBRARY_PATH=/opt/axon/libaxon_pjrt.so"
env $ENV_COMMON \
  HN_PJRT_CLIENT_OPTIONS="remote_compile=1;local_only=0;priority=0;topology=str:v5e:1x1x1;n_slices=1;session_id=str:hydranet-post-f;rank=4294967295" \
  timeout 2400 ./deploy/build/hydranet_demo /tmp/artifact_float 1 "$IMG" \
  /tmp/deploy_float_out.png > artifacts/deploy_run_float.log 2>&1
echo "[chain5] float C++ run exit=$?"
sleep 100
env $ENV_COMMON \
  HN_PJRT_CLIENT_OPTIONS="remote_compile=1;local_only=0;priority=0;topology=str:v5e:1x1x1;n_slices=1;session_id=str:hydranet-post-q;rank=4294967295" \
  timeout 2400 ./deploy/build/hydranet_demo /tmp/artifact_int8 1 "$IMG" \
  /tmp/deploy_int8_out.png > artifacts/deploy_run_int8.log 2>&1
echo "[chain5] int8 C++ run exit=$?"
sleep 100; stop_check

echo "[chain5] 10/15 seg-final variants standalone (incl. pallas kernel)"
BENCH_BATCH=128 timeout 2400 python -u scripts/bench_seg_final_v2.py \
  > artifacts/bench_seg_final_v2_hw.log 2>&1
echo "[chain5] seg-final exit=$? at $(date)"
sleep 100; stop_check

echo "[chain5] 11/15 in-pipeline bench with HN_PALLAS_SEGFINAL=1"
HN_PALLAS_SEGFINAL=1 timeout 1800 python -u bench.py \
  > artifacts/bench_segfinal_pallas.log 2>&1
echo "[chain5] pallas-bench exit=$? at $(date)"
sleep 100; stop_check

echo "[chain5] 12/15 int8-PTQ bench"
HN_QUANT=int8 timeout 2400 python -u bench.py > artifacts/bench_int8.log 2>&1
echo "[chain5] int8-bench exit=$? at $(date)"
sleep 100; stop_check

echo "[chain5] 13/15 Pallas-neck in-pipeline bench + serving soak"
HN_PALLAS_NECK=1 timeout 1800 python -u bench.py \
  > artifacts/bench_neck_pallas.log 2>&1
echo "[chain5] neck-bench exit=$? at $(date)"
sleep 100
timeout 3600 python -u scripts/soak_serving.py 200 \
  > artifacts/soak_serving_r3.log 2>&1
echo "[chain5] soak exit=$? at $(date)"
sleep 100; stop_check

echo "[chain5] 14/15 train sweep"
timeout 5400 python -u bench_train.py --sweep > artifacts/bench_train_sweep_r3.log 2>&1
echo "[chain5] sweep exit=$? at $(date)"
sleep 100; stop_check

echo "[chain5] 15/15 best-combo bench: union of kernel flags that"
echo "          individually beat the fresh baseline (quant excluded —"
echo "          it changes accuracy, not just speed)"
COMBO=$(python - <<'EOF'
import json, re
def fps(path):
    try:
        for line in open(path):
            if '"value"' in line:
                return json.loads(line[line.index("{"):])["value"]
    except Exception:
        return None
base = fps("artifacts/bench_r3.log")
flags = []
for flag, log in [("HN_PALLAS_TOWER", "artifacts/bench_tower_pallas.log"),
                  ("HN_PALLAS_SEGFINAL", "artifacts/bench_segfinal_pallas.log"),
                  ("HN_PALLAS_NECK", "artifacts/bench_neck_pallas.log")]:
    v = fps(log)
    if base and v and v > base:
        flags.append(f"{flag}=1")
print(" ".join(flags))
EOF
)
echo "[chain5] combo flags: '$COMBO'"
if [ -n "$COMBO" ]; then
  env $COMBO timeout 1800 python -u bench.py \
    > artifacts/bench_best_combo.log 2>&1
  echo "[chain5] combo-bench exit=$? at $(date)"
fi
echo "[chain5] ALL DONE at $(date)"
