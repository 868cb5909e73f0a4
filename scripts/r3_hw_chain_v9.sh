#!/bin/bash
# Round-3 hardware chain v9: seg-final kernel re-measure after the halo
# restructure (v8 hit Mosaic's no-mixed-Element-BlockSpec rule; the
# kernel now has halo=dma|element variants, swept per-cell), the bs128
# phase-CE train single the sweep couldn't compile without full remat,
# and a fresh bench.py if the kernel wins.
cd /root/repo || exit 1
rm -f /tmp/stop_chain

stop_check() {
  if [ -f /tmp/stop_chain ]; then
    echo "[chain9] stop sentinel found — exiting at $(date)"
    exit 0
  fi
}

echo "[chain9] waiting for chain v8 to exit ($(date))"
while ps -p "$(cat /tmp/r3chain8.pid 2>/dev/null)" >/dev/null 2>&1; do
  stop_check
  sleep 60
done
echo "[chain9] v8 gone at $(date); letting its relay claim expire"
sleep 120

echo "[chain9] 1/3 seg-final variant sweep (halo x unroll x rb)"
BENCH_BATCH=128 timeout 3600 python -u scripts/bench_seg_final_v2.py \
  > artifacts/bench_seg_final_v2_hw.log 2>&1
echo "[chain9] seg-final exit=$? at $(date)"
sleep 100; stop_check

echo "[chain9] 2/3 bs128 phase-CE train single (remat+seg-remat defaults)"
HN_PHASE_LOSS=1 timeout 3600 python -u bench_train.py \
  > artifacts/bench_train_phase_bs128.log 2>&1
echo "[chain9] phase-bs128 exit=$? at $(date)"
sleep 100; stop_check

echo "[chain9] 3/3 in-pipeline bench with the best kernel cell (if any"
echo "          standalone cell beat variant a); reads the sweep log"
BEST=$(python - <<'EOF'
import re
best = None
try:
    base = None
    for line in open("artifacts/bench_seg_final_v2_hw.log"):
        m = re.match(r"([ad])\) (.*?)\s+([0-9.]+) ms", line)
        if not m:
            continue
        label, ms = m.group(2).strip(), float(m.group(3))
        if m.group(1) == "a":
            base = ms
            continue
        if base and ms < base and (best is None or ms < best[1]):
            best = (label, ms)
except Exception:
    pass
if best:
    h = re.search(r"halo=(\w+)", best[0])
    u = re.search(r"unroll=(\d)", best[0])
    rb = re.search(r"rb=(\w+)", best[0])
    env = ["HN_PALLAS_SEGFINAL=" + ("2" if u and u.group(1) == "1" else "1")]
    if h:
        env.append("HN_SEGFINAL_HALO=" + h.group(1))
    if rb and rb.group(1) != "max":
        env.append("HN_SEGFINAL_RB=" + rb.group(1))
    print(" ".join(env))
EOF
)
echo "[chain9] best-cell env: '$BEST'"
if [ -n "$BEST" ]; then
  env $BEST timeout 1800 python -u bench.py \
    > artifacts/bench_segfinal_pallas.log 2>&1
  echo "[chain9] pallas-bench exit=$? at $(date)"
fi
echo "[chain9] ALL DONE at $(date)"
