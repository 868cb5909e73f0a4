#!/bin/bash
# Stall watchdog for chain training steps: scripts/train_convergence.py
# retries on EXCEPTIONS (tunnel errors surface as exceptions and auto-resume
# handles process death), but a wedged relay RPC just blocks forever —
# observed r5: epoch-36 validation hung at 10:05Z with zero CPU advance,
# which would have burned the whole day's step-1 timeout budget.
#
# Policy: if a train_convergence.py python process exists AND its metrics
# output has not been touched for STALL_MIN minutes, kill THAT PID (found
# fresh each probe by exact command match + ppid=timeout/1; never
# pattern-kill). The chain's step then completes with the epochs trained so
# far and moves on; auto-resume can finish the tail later.
#
# STALL_MIN is deliberately > the longest legitimate silent phase (first
# validation after a resume recompiles: ~8-10 min through the tunnel).
set -u
cd "$(dirname "$0")/.."

STALL_MIN="${STALL_MIN:-18}"
PROBE_S=120

log() { echo "[watchdog $(date -u +%H:%M:%S)] $*"; }

log "armed: stall threshold ${STALL_MIN} min"
while true; do
  sleep "$PROBE_S"
  [ -f /tmp/stop_watchdog ] && { log "stop flag, exiting"; exit 0; }
  # the newest file the trainer writes at least once per epoch
  newest=-1
  for f in artifacts/convergence_metrics_r5.jsonl \
           artifacts/convergence_metrics_r5ft.jsonl \
           artifacts/train_convergence_r5.log \
           artifacts/train_convergence_r5ft.log \
           artifacts/convergence_metrics_r5ft2.jsonl \
           artifacts/train_convergence_r5ft2.log; do
    [ -f "$f" ] || continue
    m=$(stat -c %Y "$f")
    [ "$m" -gt "$newest" ] && newest=$m
  done
  [ "$newest" -lt 0 ] && continue
  age_min=$(( ( $(date +%s) - newest ) / 60 ))
  # main trainer process: python whose parent is the chain's timeout (or
  # init after a partial teardown), never a loader worker (ppid = trainer)
  mapfile -t pids < <(ps -eo pid,ppid,comm,args \
    | awk '$3=="python" && $0 ~ /train_convergence\.py/ {print $1, $2}')
  main_pid=""
  for line in "${pids[@]:-}"; do
    [ -z "$line" ] && continue
    p=${line% *}; pp=${line#* }
    pcmd=$(ps -o comm= -p "$pp" 2>/dev/null || true)
    if [ "$pcmd" != "python" ]; then main_pid=$p; fi
  done
  [ -z "$main_pid" ] && continue
  # a freshly started trainer is legitimately silent through its first
  # compile; never let a stale file from a PREVIOUS run count against it
  # (observed 03:08Z: a watchdog with an outdated watch list killed two
  # live trainers 150 s after launch because another run's jsonl was
  # 55 min old). Liveness age = min(file age, process age).
  etimes=$(ps -o etimes= -p "$main_pid" 2>/dev/null | tr -d ' ')
  if [ -n "$etimes" ]; then
    proc_min=$(( etimes / 60 ))
    [ "$proc_min" -lt "$age_min" ] && age_min=$proc_min
  fi
  if [ "$age_min" -ge "$STALL_MIN" ]; then
    log "STALL: no trainer output for ${age_min} min; killing pid $main_pid"
    kill "$main_pid" 2>/dev/null
    sleep 30
    if ps -p "$main_pid" >/dev/null 2>&1; then
      log "escalating to SIGKILL for $main_pid"
      kill -9 "$main_pid" 2>/dev/null
    fi
    # orphaned loader workers (ppid reparented to 1) hold the chain's pipe
    sleep 10
    mapfile -t orph < <(ps -eo pid,ppid,args \
      | awk '$2==1 && /train_convergence\.py/ {print $1}')
    for p in "${orph[@]:-}"; do
      [ -n "$p" ] && kill "$p" 2>/dev/null
    done
    log "killed trainer + ${#orph[@]} orphaned workers"
  fi
done
