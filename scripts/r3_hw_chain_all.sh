#!/bin/bash
# Round-3 combined hardware chain: wait for the TPU tunnel, then run ALL
# pending hardware work in value order (one process at a time — the relay
# is single-claim; sleeps let each claim expire). Highest-value evidence
# first: headline bench, train profile, then the long convergence run
# (incremental per-epoch metrics — partial runs are still evidence), then
# the checkpoint-dependent follow-ups and remaining benches.
cd /root/repo || exit 1
echo "[chain] waiting for TPU tunnel, probing every 60s ($(date))"
while true; do
  if timeout 180 python -c "import jax; d=jax.devices(); assert d and d[0].platform != 'cpu'" >/dev/null 2>&1; then
    break
  fi
  sleep 60
done
echo "[chain] TPU up at $(date); letting the probe's relay claim expire"
sleep 100

echo "[chain] 1/9 fresh baseline bench"
timeout 1800 python -u bench.py > artifacts/bench_r3.log 2>&1
echo "[chain] baseline-bench exit=$? at $(date)"
sleep 100

echo "[chain] 2/9 train-step profile (bs64)"
timeout 5400 python -u scripts/profile_train.py > artifacts/profile_train_r3.log 2>&1
echo "[chain] profile exit=$? at $(date)"
sleep 100

echo "[chain] 3/9 convergence run (40 epochs, lane_weight 1.0, precise-BN, eval thr 0.05)"
python -u scripts/train_convergence.py --out artifacts/convergence_metrics_r3b.jsonl \
  > artifacts/train_convergence_r3b.log 2>&1
echo "[chain] convergence exit=$? at $(date)"
sleep 100

echo "[chain] 4/9 PTQ accuracy+speed study on the trained checkpoint"
timeout 5400 python -u scripts/ptq_study.py --bench \
  > artifacts/ptq_study_hw.log 2>&1
echo "[chain] ptq_study exit=$? at $(date)"
sleep 100

echo "[chain] 5/9 demo overlays from the trained checkpoint"
CKPT=$(python - <<'EOF'
import sys
sys.path.insert(0, "scripts")
from train_convergence import latest_checkpoint
print(latest_checkpoint("artifacts/convergence_logs"))
EOF
)
echo "[chain] ckpt: $CKPT"
if [ -n "$CKPT" ]; then
  mkdir -p /tmp/demo_val_imgs
  head -8 artifacts/procedural_data/list/valid.txt | while read -r p; do
    cp "artifacts/procedural_data/$p" /tmp/demo_val_imgs/ 2>/dev/null \
      || cp "$p" /tmp/demo_val_imgs/ 2>/dev/null || true
  done
  timeout 1800 python -u -m hydranet_tpu.demo \
    --config configs/hydranet_convergence_procedural.yml \
    --checkpoint "$CKPT" \
    --images /tmp/demo_val_imgs \
    --out artifacts/demo_overlays_r3 \
    > artifacts/demo_overlays_r3.log 2>&1
  echo "[chain] demo exit=$? at $(date)"
fi
sleep 100

echo "[chain] 6/9 seg-final variants standalone (incl. pallas kernel)"
BENCH_BATCH=128 timeout 2400 python -u scripts/bench_seg_final_v2.py \
  > artifacts/bench_seg_final_v2_hw.log 2>&1
echo "[chain] seg-final exit=$? at $(date)"
sleep 100

echo "[chain] 7/9 in-pipeline bench with HN_PALLAS_SEGFINAL=1"
HN_PALLAS_SEGFINAL=1 timeout 1800 python -u bench.py \
  > artifacts/bench_segfinal_pallas.log 2>&1
echo "[chain] pallas-bench exit=$? at $(date)"
sleep 100

echo "[chain] 8/9 int8-PTQ bench"
HN_QUANT=int8 timeout 2400 python -u bench.py > artifacts/bench_int8.log 2>&1
echo "[chain] int8-bench exit=$? at $(date)"
sleep 100

echo "[chain] 9/9 train sweep"
timeout 5400 python -u bench_train.py --sweep > artifacts/bench_train_sweep_r3.log 2>&1
echo "[chain] sweep exit=$? at $(date)"
echo "[chain] ALL DONE at $(date)"
