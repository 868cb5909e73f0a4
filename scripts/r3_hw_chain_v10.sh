#!/bin/bash
# Round-3 hardware chain v10: after v9 (seg-final sweep + phase bs128 +
# conditional pallas bench), run the host-RSS leak probe that v8 never
# got to (the 40-epoch convergence run was OOM-killed at 123 GB anon
# RSS; mem_probe_hw A/B-tests donated vs non-donated train dispatch vs
# a serving control on-chip), then one clean bench.py so the round ends
# on a fresh default-config baseline.
cd /root/repo || exit 1

stop_check() {
  if [ -f /tmp/stop_chain ]; then
    echo "[chain10] stop sentinel found — exiting at $(date)"
    exit 0
  fi
}

echo "[chain10] waiting for chain v9 to exit ($(date))"
while ps -p "$(cat /tmp/r3chain9.pid 2>/dev/null)" >/dev/null 2>&1; do
  stop_check
  sleep 60
done
echo "[chain10] v9 gone at $(date); letting its relay claim expire"
sleep 120
stop_check

echo "[chain10] 1/2 host-RSS leak probe (donate A/B + serving control)"
timeout 2400 python -u scripts/mem_probe_hw.py --steps 30 --batch 16 \
  > artifacts/mem_probe_hw.log 2>&1
echo "[chain10] mem-probe exit=$? at $(date)"
sleep 100; stop_check

echo "[chain10] 2/2 clean default-config bench.py baseline"
timeout 1800 python -u bench.py > artifacts/bench_r3_final.log 2>&1
echo "[chain10] bench exit=$? at $(date)"
echo "[chain10] ALL DONE at $(date)"
