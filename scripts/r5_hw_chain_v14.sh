#!/bin/bash
# Round-5 hardware chain v14 — follow-up to v13 after its matrix+soak
# steps land. Runs the remaining owed evidence in value order:
#   1  CORRECTED fine-tuning demo: the first r5ft attempt trained at the
#      cosine START LR (schedule count reset by tx.init — fixed in
#      train_convergence.py); re-run seeded from the committed npz at the
#      true tail LR -> convergence_metrics_r5ft2.jsonl + summary
#   2  roofline re-emit at shipped defaults (VERDICT r4 weak #7)
#   3  cheap-lever sweep, trained cells first (VERDICT r4 ask #7)
# Every step commits its artifacts immediately. Stop: touch /tmp/stop_chain.
set -u
set -o pipefail
cd "$(dirname "$0")/.."

DEADLINE_UTC="${DEADLINE_UTC:-0710}"

rm -f /tmp/stop_chain
echo "=== chain v14 start $(date -u +%H:%M:%S) ==="

secs_left() {
  local now tgt
  now=$(date -u +%s)
  tgt=$(date -u -d "today ${DEADLINE_UTC:0:2}:${DEADLINE_UTC:2:2}" +%s)
  if [ "$tgt" -le "$now" ]; then tgt=$((tgt + 86400)); fi
  echo $((tgt - now))
}

step_budget() {
  local s cap="${1:-0}"
  s=$(secs_left)
  if [ "$cap" -gt 0 ] && [ "$s" -gt "$cap" ]; then s=$cap; fi
  if [ "$s" -lt 60 ]; then echo 60; else echo "$s"; fi
}

guard() {
  sleep 90
  if [ -f /tmp/stop_chain ]; then
    echo "=== stop_chain seen, aborting before: $1 ==="; exit 0
  fi
  if [ "$(secs_left)" -lt 180 ]; then
    echo "=== past deadline $DEADLINE_UTC, standing down before: $1 ==="
    exit 0
  fi
  echo "--- $1 $(date -u +%H:%M:%S) ---"
}

commit_now() {
  local msg="$1"; shift
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg" 2>/dev/null && echo "committed: $msg" || true
}

rows() { [ -f "$1" ] && grep -c '"epoch"' "$1" || echo 0; }

# ---------------------------------------------------------------- step 1
guard "[1/3] corrected fine-tuning demo (tail-LR seeded turns)"
if [ "$(rows artifacts/convergence_metrics_r5ft2.jsonl)" -ge 7 ]; then
  echo "already landed, skipping"
else
  if [ ! -f artifacts/convergence_metrics_r5ft2.jsonl ] && \
     [ -f artifacts/convergence_metrics_r5.jsonl ]; then
    tail -1 artifacts/convergence_metrics_r5.jsonl \
      > artifacts/convergence_metrics_r5ft2.jsonl
  fi
  timeout "$(step_budget 4500)" python scripts/train_convergence.py \
    --epochs 46 --fine-tuning --epoch-tuning 2 --auto-resume \
    --seed-npz artifacts/trained_ckpt_r5.npz \
    --logs artifacts/convergence_logs_ft2 \
    --out artifacts/convergence_metrics_r5ft2.jsonl 2>&1 \
    | tee -a artifacts/train_convergence_r5ft2.log \
    | grep -E "EPOCH SUMMARY|EPOCH [0-9]+ [A-Z]+ TRAINING|seeded|auto-resume|retry|done"
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"
python scripts/summarize_finetuning.py \
  artifacts/convergence_metrics_r5ft2.jsonl 2>/dev/null \
  | tee -a artifacts/train_convergence_r5ft2.log || true
commit_now "fine-tuning r5 take 2: tail-LR turns from the converged ckpt" \
  artifacts/convergence_metrics_r5ft2.jsonl artifacts/train_convergence_r5ft2.log

# ---------------------------------------------------------------- step 2
guard "[2/3] roofline at shipped defaults"
if grep -q "TOTAL" artifacts/roofline_r5.log 2>/dev/null; then
  echo "already landed, skipping"
else
  timeout "$(step_budget 3600)" python scripts/roofline_serving.py 2>&1 \
    | tee artifacts/roofline_r5.log | tail -25
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"
commit_now "roofline r5 at shipped defaults (post-wpack/phase-tail)" \
  artifacts/roofline_r5.log

# ---------------------------------------------------------------- step 3
guard "[3/3] lever sweep (trained cells first)"
if grep -q "LEVERS DONE" artifacts/bench_levers_r5.log 2>/dev/null; then
  echo "already landed, skipping"
else
  timeout "$(step_budget)" python scripts/bench_levers.py 2>&1 \
    | tee artifacts/bench_levers_r5.log | tail -40
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"
commit_now "bench r5: cheap-lever sweep (trained + flagship cells)" \
  artifacts/bench_levers_r5.log

echo "=== chain v14 done $(date -u +%H:%M:%S) ==="
