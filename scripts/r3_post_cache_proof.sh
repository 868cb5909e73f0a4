#!/bin/bash
# Post-chain: prove the C++ executable cache. Chain v5 step 9 runs
# hydranet_demo on /tmp/artifact_float once (cold: PJRT compile, writes
# <artifact>/executable.cache). This script waits for the chain to finish,
# then runs the SAME artifact again — the second run must log
# "[hydranet] executable cache hit" and a far smaller init time.
cd /root/repo || exit 1

while kill -0 "$(cat /tmp/r3chain.pid 2>/dev/null)" 2>/dev/null; do
  sleep 120
done
echo "[post-cache] chain finished at $(date)"
sleep 120   # let the chain's last relay claim expire

if [ ! -f /tmp/artifact_float/module.mlir ]; then
  echo "[post-cache] no float artifact — chain step 8 failed; abort"
  exit 1
fi
ls -la /tmp/artifact_float/executable.cache 2>/dev/null \
  || echo "[post-cache] note: no cache file written by the cold run"

IMG=$(head -1 artifacts/procedural_data/list/valid.txt)
[ -f "$IMG" ] || IMG=$(ls artifacts/procedural_data/images/*.jpg | head -1)
ENV_COMMON="AXON_POOL_SVC_OVERRIDE=127.0.0.1 TPU_WORKER_HOSTNAMES=localhost \
AXON_COMPAT_VERSION=49 AXON_LOOPBACK_RELAY=1 \
PJRT_LIBRARY_PATH=/opt/axon/libaxon_pjrt.so"
env $ENV_COMMON \
  HN_PJRT_CLIENT_OPTIONS="remote_compile=1;local_only=0;priority=0;topology=str:v5e:1x1x1;n_slices=1;session_id=str:hydranet-cacheproof;rank=4294967295" \
  timeout 2400 ./deploy/build/hydranet_demo /tmp/artifact_float 1 "$IMG" \
  /tmp/deploy_cached_out.png > artifacts/deploy_run_float_cached.log 2>&1
echo "[post-cache] warm run exit=$?"
grep -E "cache hit|loaded .* pipeline in" artifacts/deploy_run_float_cached.log
echo "[post-cache] done at $(date)"
