#!/bin/bash
# Round-3 hardware chain: wait for the TPU tunnel, then run the pending
# hardware work in sequence (one process at a time — the relay is
# single-claim): 1) train-step stage profile, 2) 40-epoch convergence run.
# Logs land in artifacts/.
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

echo "[chain] 1/2 train-step profile (bs64)"
timeout 5400 python -u scripts/profile_train.py > artifacts/profile_train_r3.log 2>&1
echo "[chain] profile exit=$? at $(date)"
sleep 100

echo "[chain] 2/2 convergence run (40 epochs, lane_weight 1.0, precise-BN)"
python -u scripts/train_convergence.py --out artifacts/convergence_metrics_r3b.jsonl \
  > artifacts/train_convergence_r3b.log 2>&1
echo "[chain] convergence exit=$? at $(date)"
