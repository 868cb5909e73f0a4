#!/bin/bash
# Round-3 hardware chain v8: re-run the seg-final Pallas kernel benches
# (v7 steps 8-9 died in Mosaic lowering on fori_loop unroll=2 — fixed),
# then the host-RSS leak probe (the 40-epoch convergence run was
# OOM-killed at 123 GB anon RSS; scripts/mem_probe_hw.py A/B-tests
# donated vs non-donated train dispatch vs a serving control on-chip).
cd /root/repo || exit 1
rm -f /tmp/stop_chain

stop_check() {
  if [ -f /tmp/stop_chain ]; then
    echo "[chain8] stop sentinel found — exiting at $(date)"
    exit 0
  fi
}

echo "[chain8] waiting for chain v7 to exit ($(date))"
while ps -p "$(cat /tmp/r3chain.pid 2>/dev/null)" >/dev/null 2>&1; do
  stop_check
  sleep 60
done
echo "[chain8] v7 gone at $(date); letting its relay claim expire"
sleep 120

echo "[chain8] 1/4 seg-final variants standalone (fixed pallas kernel)"
BENCH_BATCH=128 timeout 2400 python -u scripts/bench_seg_final_v2.py \
  > artifacts/bench_seg_final_v2_hw.log 2>&1
echo "[chain8] seg-final exit=$? at $(date)"
sleep 100; stop_check

echo "[chain8] 2/4 in-pipeline bench with HN_PALLAS_SEGFINAL=1"
HN_PALLAS_SEGFINAL=1 timeout 1800 python -u bench.py \
  > artifacts/bench_segfinal_pallas.log 2>&1
echo "[chain8] pallas-bench exit=$? at $(date)"
sleep 100; stop_check

echo "[chain8] 3/4 host-RSS leak probe (donate A/B + serving control)"
timeout 3600 python -u scripts/mem_probe_hw.py --steps 30 --batch 16 \
  > artifacts/mem_probe_hw.log 2>&1
echo "[chain8] mem-probe exit=$? at $(date)"
sleep 100; stop_check

echo "[chain8] 4/4 phase-CE single at bs64 (HN_PHASE_LOSS=1) if the sweep missed it"
if ! grep -q '"phase_loss": true' artifacts/bench_train_sweep_r3.log; then
  HN_PHASE_LOSS=1 BENCH_TRAIN_BATCH=64 timeout 2400 python -u bench_train.py \
    > artifacts/bench_train_phase_bs64.log 2>&1
  echo "[chain8] phase-bench exit=$? at $(date)"
fi
echo "[chain8] ALL DONE at $(date)"
