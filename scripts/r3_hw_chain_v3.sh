#!/bin/bash
# Round-3 hardware chain v3: det-tower kernel measurements. Waits for
# chain v2 (pid in /tmp/r3chain.pid) to finish so the TPU relay is free,
# re-probes the tunnel, then runs the standalone tower bench and the
# in-pipeline bench with the kernel enabled. `touch /tmp/stop_chain`
# halts it between steps. Self-terminating.
cd /root/repo || exit 1

stop_check() {
  if [ -f /tmp/stop_chain ]; then
    echo "[chain3] stop sentinel found — exiting at $(date)"
    exit 0
  fi
}

echo "[chain3] waiting for chain v2 to finish ($(date))"
while [ -f /tmp/r3chain.pid ] && kill -0 "$(cat /tmp/r3chain.pid)" 2>/dev/null; do
  stop_check
  sleep 120
done
echo "[chain3] v2 done; probing tunnel ($(date))"
while true; do
  stop_check
  if timeout 180 python -c "import jax; d=jax.devices(); assert d and d[0].platform != 'cpu'" >/dev/null 2>&1; then
    break
  fi
  sleep 60
done
echo "[chain3] TPU up at $(date); letting the probe's relay claim expire"
sleep 100

echo "[chain3] 1/2 det-tower standalone bench (XLA vs fused kernel)"
timeout 2400 python -u scripts/bench_det_tower.py \
  > artifacts/bench_det_tower.log 2>&1
echo "[chain3] det-tower exit=$? at $(date)"
sleep 100; stop_check

echo "[chain3] 2/2 in-pipeline bench with HN_PALLAS_TOWER=1"
HN_PALLAS_TOWER=1 timeout 1800 python -u bench.py \
  > artifacts/bench_tower_pallas.log 2>&1
echo "[chain3] tower-bench exit=$? at $(date)"
echo "[chain3] ALL DONE at $(date)"
