#!/bin/bash
# Round-3 hardware chain: wait for the TPU tunnel, then run the pending
# hardware work in sequence (one process at a time — the relay is
# single-claim). Short evidence items first, then the long convergence
# run (which writes per-epoch metrics incrementally, so partial runs are
# still evidence). Logs land in artifacts/.
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

echo "[chain] 1/5 train-step profile (bs64)"
timeout 5400 python -u scripts/profile_train.py > artifacts/profile_train_r3.log 2>&1
echo "[chain] profile exit=$? at $(date)"
sleep 100

echo "[chain] 2/5 seg-final variants standalone (incl. pallas kernel)"
BENCH_BATCH=128 timeout 2400 python -u scripts/bench_seg_final_v2.py \
  > artifacts/bench_seg_final_v2_hw.log 2>&1
echo "[chain] seg-final exit=$? at $(date)"
sleep 100

echo "[chain] 3/5 in-pipeline bench with HN_PALLAS_SEGFINAL=1"
HN_PALLAS_SEGFINAL=1 timeout 1800 python -u bench.py \
  > artifacts/bench_segfinal_pallas.log 2>&1
echo "[chain] pallas-bench exit=$? at $(date)"
sleep 100

echo "[chain] 4/6 fresh baseline bench"
timeout 1800 python -u bench.py > artifacts/bench_r3.log 2>&1
echo "[chain] baseline-bench exit=$? at $(date)"
sleep 100

echo "[chain] 5/6 int8-PTQ bench"
HN_QUANT=int8 timeout 2400 python -u bench.py > artifacts/bench_int8.log 2>&1
echo "[chain] int8-bench exit=$? at $(date)"
sleep 100

echo "[chain] 6/6 convergence run (40 epochs, lane_weight 1.0, precise-BN, eval thr 0.05)"
python -u scripts/train_convergence.py --out artifacts/convergence_metrics_r3b.jsonl \
  > artifacts/train_convergence_r3b.log 2>&1
echo "[chain] convergence exit=$? at $(date)"
sleep 100

echo "[chain] bonus: train sweep"
timeout 5400 python -u bench_train.py --sweep > artifacts/bench_train_sweep_r3.log 2>&1
echo "[chain] sweep exit=$? at $(date)"
