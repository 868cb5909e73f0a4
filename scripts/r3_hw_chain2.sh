#!/bin/bash
# Round-3 follow-up hardware chain — run AFTER r3_hw_chain.sh completes
# (needs the trained convergence checkpoint). One relay claim at a time.
cd /root/repo || exit 1

echo "[chain2] 1/2 PTQ accuracy+speed study on the trained checkpoint"
timeout 5400 python -u scripts/ptq_study.py --bench \
  > artifacts/ptq_study_hw.log 2>&1
echo "[chain2] ptq_study exit=$? at $(date)"
sleep 100

echo "[chain2] 2/2 demo overlays from the trained checkpoint"
CKPT=$(python - <<'EOF'
import sys
sys.path.insert(0, "scripts")
from train_convergence import latest_checkpoint
print(latest_checkpoint("artifacts/convergence_logs"))
EOF
)
echo "[chain2] ckpt: $CKPT"
if [ -n "$CKPT" ]; then
  # small val-image subset for the overlay demo
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
  echo "[chain2] demo exit=$? at $(date)"
fi
