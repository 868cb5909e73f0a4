#!/bin/bash
# Round-3 post-chain 2: opt-in kernel benches + serving soak, after
# r3_post_chain.sh releases the relay.
cd /root/repo || exit 1
POST_PID=$(cat /tmp/r3post.pid 2>/dev/null)
if [ -n "$POST_PID" ]; then
  echo "[post2] waiting for post-chain pid $POST_PID"
  while kill -0 "$POST_PID" 2>/dev/null; do sleep 60; done
fi
echo "[post2] post-chain done at $(date); letting its relay claim expire"
sleep 120

echo "[post2] 1/2 in-pipeline bench with the Pallas BiFPN cell (HN_PALLAS_NECK=1)"
HN_PALLAS_NECK=1 timeout 1800 python -u bench.py \
  > artifacts/bench_neck_pallas.log 2>&1
echo "[post2] neck-bench exit=$? at $(date)"
sleep 100

echo "[post2] 2/2 serving soak (200 batches, bs128)"
timeout 3600 python -u scripts/soak_serving.py 200 \
  > artifacts/soak_serving_r3.log 2>&1
echo "[post2] soak exit=$? at $(date)"
echo "[post2] ALL DONE at $(date)"
