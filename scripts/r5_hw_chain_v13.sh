#!/bin/bash
# Round-5 hardware chain v13 — converts "fast on random init" into
# "fast and correct on trained weights, end to end through the C ABI,
# with evidence that survives a VM restore" (VERDICT r4, all 8 asks):
#   1  40-epoch joint convergence on the procedural set (auto-resume;
#      a background committer snapshots the metrics jsonl + log every
#      10 min so a VM restore cannot wipe the curve again)
#   2  compact bf16 checkpoint export -> artifacts/trained_ckpt_r5.npz,
#      COMMITTED (wipe-proof trained weights; bench.py serves it by
#      default from now on)
#   3  trained-weights bench pair: HN_CKPT cell + random-init control
#      at the same config (the delta is the honest trained-density cost)
#   4  trained deploy golden run: export artifact from the trained
#      ckpt, run the C ABI demo on a committed procedural frame,
#      require NONZERO detections + lanes, golden-compare structs vs
#      the Python pipeline (deploy/golden_compare.py)
#   5  C-ABI latency sweep bs in {1,4,8,16} with the corrected
#      ExecuteTimed decomposition (exec clock fenced by a digest fetch)
#   6  fine-tuning demo FROM THE CONVERGED ckpt (epochs 40-45 =
#      LANE/DET/SEG x2 at the cosine tail) + summary table
#   7  full BASELINE matrix (5 configs) + soak at current defaults
#   8  roofline re-emit at shipped defaults + cheap-lever sweep
# Every step commits its artifacts immediately (VERDICT weak #6).
# Stop early: touch /tmp/stop_chain.
set -u
set -o pipefail
cd "$(dirname "$0")/.."

DEADLINE_UTC="${DEADLINE_UTC:-1915}"  # HHMM UTC; no new step after this

rm -f /tmp/stop_chain
echo "=== chain v13 start $(date -u +%H:%M:%S) ==="

# seconds until the deadline; rolls to tomorrow when the computed target
# is already past (ADVICE r4: the v12 form returned 0 for a deadline on
# the other side of midnight and the chain stood down before step 1)
secs_left() {
  local now tgt
  now=$(date -u +%s)
  tgt=$(date -u -d "today ${DEADLINE_UTC:0:2}:${DEADLINE_UTC:2:2}" +%s)
  if [ "$tgt" -le "$now" ]; then tgt=$((tgt + 86400)); fi
  echo $((tgt - now))
}

# per-step timeout: min(seconds to deadline, optional per-step cap),
# clamped to >=60 so a zero can never reach GNU timeout (timeout 0
# DISABLES the limit — ADVICE r4). The cap keeps one wedged relay RPC
# from eating every later step's budget (observed r5: epoch-36 val hang).
step_budget() {
  local s cap="${1:-0}"
  s=$(secs_left)
  if [ "$cap" -gt 0 ] && [ "$s" -gt "$cap" ]; then s=$cap; fi
  if [ "$s" -lt 60 ]; then echo 60; else echo "$s"; fi
}

guard() {
  # settle delay: a back-to-back step start can race the previous
  # process's relay-claim release and wedge on a dead RPC
  sleep 90
  if [ -f /tmp/stop_chain ]; then
    echo "=== stop_chain seen, aborting before: $1 ==="
    exit 0
  fi
  if [ "$(secs_left)" -lt 180 ]; then
    echo "=== past deadline $DEADLINE_UTC, standing down before: $1 ==="
    exit 0
  fi
  echo "--- $1 $(date -u +%H:%M:%S) ---"
}

commit_now() {  # commit_now "<msg>" path...
  local msg="$1"; shift
  git add -f "$@" 2>/dev/null
  git commit -q -m "$msg" 2>/dev/null && echo "committed: $msg" || true
}

rows() { [ -f "$1" ] && grep -c '"epoch"' "$1" || echo 0; }

# ---------------------------------------------------------------- step 1
guard "[1/8] 40-epoch joint convergence (procedural)"
if [ "$(rows artifacts/convergence_metrics_r5.jsonl)" -ge 40 ]; then
  echo "already landed ($(rows artifacts/convergence_metrics_r5.jsonl) rows), skipping"
else
  # background committer: snapshot curve evidence every 10 min
  (while true; do sleep 600; \
     git add -f artifacts/convergence_metrics_r5.jsonl \
       artifacts/train_convergence_r5.log 2>/dev/null; \
     git commit -q -m "convergence r5: metrics snapshot (auto)" 2>/dev/null; \
   done) & COMMITTER=$!
  timeout "$(step_budget)" python scripts/train_convergence.py \
    --epochs 40 --auto-resume \
    --out artifacts/convergence_metrics_r5.jsonl 2>&1 \
    | tee -a artifacts/train_convergence_r5.log \
    | grep -E "EPOCH SUMMARY|EPOCH [0-9]+ [A-Z]+ TRAINING|auto-resume|retry|done"
  rc=$?
  kill "$COMMITTER" 2>/dev/null
  echo "--- exit: $rc $(date -u +%H:%M:%S) ---"
fi
commit_now "convergence r5: 40-epoch curve + log" \
  artifacts/convergence_metrics_r5.jsonl artifacts/train_convergence_r5.log

# ---------------------------------------------------------------- step 2
guard "[2/8] compact trained-ckpt export (wipe-proof)"
if [ -f artifacts/trained_ckpt_r5.npz ]; then
  echo "already landed, skipping"
else
  timeout 900 python scripts/export_compact_ckpt.py 2>&1 | tail -20
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"
commit_now "trained compact checkpoint r5 (bf16 params, committed evidence)" \
  artifacts/trained_ckpt_r5.npz artifacts/trained_ckpt_r5.npz.json

# ---------------------------------------------------------------- step 3
guard "[3/8] trained-weights bench pair (trained + random-init control)"
if grep -q '"value"' artifacts/bench_trained_r5.log 2>/dev/null; then
  echo "already landed, skipping"
else
  { echo "# trained cell: default bench.py now serves the committed compact";
    echo "# ckpt (convergence config); real trained score densities.";
    timeout 2400 python bench.py 2>&1 | tail -3;
    echo "# random-init control at the SAME config (delta = trained-density cost):";
    HN_RANDOM_INIT=1 HN_CONFIG=configs/hydranet_convergence_procedural.yml \
      timeout 2400 python bench.py 2>&1 | tail -3;
    echo "# flagship big-backbone random-init cell (cross-round continuity):";
    HN_RANDOM_INIT=1 timeout 2400 python bench.py 2>&1 | tail -3;
  } 2>&1 | tee artifacts/bench_trained_r5.log
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"
commit_now "bench r5: trained-weights cell + random-init controls" \
  artifacts/bench_trained_r5.log

# ---------------------------------------------------------------- step 4
guard "[4/8] trained deploy golden run (nonzero dets/lanes through C ABI)"
if grep -q "GOLDEN OK" artifacts/deploy_golden_r5.log 2>/dev/null; then
  echo "already landed, skipping"
else
  # the VM restore wipes deploy/build (gitignored); reconfigure when absent
  [ -f deploy/build/build.ninja ] || \
    (cd deploy && timeout 600 cmake -B build -G Ninja 2>&1 | tail -2)
  (cd deploy/build && timeout 1200 ninja 2>&1 | tail -2)
  timeout "$(step_budget 3000)" python deploy/golden_compare.py \
    --image artifacts/fixtures/demo_frame_procedural.jpg 2>&1 \
    | tee artifacts/deploy_golden_r5.log | tail -25
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"
commit_now "deploy r5: trained C-ABI golden run (real dets/lanes vs Python)" \
  artifacts/deploy_golden_r5.log

# ---------------------------------------------------------------- step 5
guard "[5/8] C-ABI latency sweep bs 1/4/8/16 (corrected ExecuteTimed)"
if grep -q "SWEEP DONE" artifacts/deploy_latency_r5.log 2>/dev/null; then
  echo "already landed, skipping"
else
  timeout "$(step_budget 3600)" python deploy/latency_sweep.py 2>&1 \
    | tee artifacts/deploy_latency_r5.log | tail -30
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"
commit_now "deploy r5: bs sweep latency table, corrected decomposition" \
  artifacts/deploy_latency_r5.log

# ---------------------------------------------------------------- step 6
guard "[6/8] fine-tuning demo from the converged ckpt (LANE/DET/SEG x2)"
if [ "$(rows artifacts/convergence_metrics_r5ft.jsonl)" -ge 7 ]; then
  echo "already landed ($(rows artifacts/convergence_metrics_r5ft.jsonl) rows), skipping"
else
  # seed the FT curve with the final JOINT epoch so the summary has the
  # converged baseline each phase is measured against
  if [ ! -f artifacts/convergence_metrics_r5ft.jsonl ] && \
     [ -f artifacts/convergence_metrics_r5.jsonl ]; then
    tail -1 artifacts/convergence_metrics_r5.jsonl \
      > artifacts/convergence_metrics_r5ft.jsonl
  fi
  timeout "$(step_budget)" python scripts/train_convergence.py \
    --epochs 46 --fine-tuning --epoch-tuning 2 --auto-resume \
    --seed-npz artifacts/trained_ckpt_r5.npz \
    --out artifacts/convergence_metrics_r5ft.jsonl 2>&1 \
    | tee -a artifacts/train_convergence_r5ft.log \
    | grep -E "EPOCH SUMMARY|EPOCH [0-9]+ [A-Z]+ TRAINING|auto-resume|retry|done"
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"
python scripts/summarize_finetuning.py \
  artifacts/convergence_metrics_r5ft.jsonl 2>/dev/null \
  | tee -a artifacts/train_convergence_r5ft.log || true
commit_now "fine-tuning r5: per-head turns from the converged ckpt" \
  artifacts/convergence_metrics_r5ft.jsonl artifacts/train_convergence_r5ft.log

# ---------------------------------------------------------------- step 7
guard "[7/8] BASELINE matrix (5 configs) + soak at current defaults"
if grep -q "config5" artifacts/bench_matrix_r5.log 2>/dev/null; then
  echo "matrix already landed, skipping"
else
  timeout "$(step_budget 5400)" python bench_matrix.py 2>&1 \
    | tee artifacts/bench_matrix_r5.log | tail -10
  commit_now "bench r5: full BASELINE matrix" artifacts/bench_matrix_r5.log
fi
guard "[7b/8] soak"
if grep -q "SOAK" artifacts/soak_r5.log 2>/dev/null; then
  echo "soak already landed, skipping"
else
  timeout "$(step_budget 2400)" python scripts/soak_serving.py 2>&1 \
    | tee artifacts/soak_r5.log | tail -6
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"
commit_now "bench r5: soak at current defaults" artifacts/soak_r5.log

# ---------------------------------------------------------------- step 8
guard "[8/8] roofline at shipped defaults + cheap-lever sweep"
if grep -q "TOTAL" artifacts/roofline_r5.log 2>/dev/null; then
  echo "roofline already landed, skipping"
else
  timeout 3600 python scripts/roofline_serving.py 2>&1 \
    | tee artifacts/roofline_r5.log | tail -25
  commit_now "roofline r5 at shipped defaults (post-wpack/phase-tail)" \
    artifacts/roofline_r5.log
fi
guard "[8b/8] lever sweep (batch 192/256, donation, scheduler flags)"
if grep -q "LEVERS DONE" artifacts/bench_levers_r5.log 2>/dev/null; then
  echo "levers already landed, skipping"
else
  timeout "$(step_budget 7200)" python scripts/bench_levers.py 2>&1 \
    | tee artifacts/bench_levers_r5.log | tail -30
fi
echo "--- exit: $? $(date -u +%H:%M:%S) ---"
commit_now "bench r5: cheap-lever sweep (the 1173~=bound question)" \
  artifacts/bench_levers_r5.log

echo "=== chain v13 done $(date -u +%H:%M:%S) ==="
