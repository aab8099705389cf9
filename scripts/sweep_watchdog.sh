#!/bin/bash
# Babysits the production sweep. Observed failure mode: a relay RPC response
# is lost and the driver blocks forever in a futex wait with ZERO CPU while
# the TPU serves other clients fine. --resume + the fidelity-aware completion
# markers make a restart lossless except for the in-flight cell.
#
# Round-4 fix: log staleness alone is NOT a stall signal — a healthy
# multi-task cell dispatches 14-32 epochs as one chunked XLA call and prints
# nothing for >15 min while the host quietly prefetches batches. The true
# stall freezes the driver's cumulative CPU clock; healthy chunk execution
# keeps burning host CPU. Restart only when BOTH hold: log stale > STALE
# seconds AND driver CPU advanced < CPUMIN seconds over the last probe
# interval.
#
#   nohup bash scripts/sweep_watchdog.sh /tmp/sweep.log 900 > /tmp/watchdog.log 2>&1 &
#   # adopt an already-running wrapper instead of launching a new one:
#   nohup bash scripts/sweep_watchdog.sh /tmp/sweep.log 900 <wrapper_pid> ...
#
# Exits when a full pipeline pass prints its "=== done" marker.
set -u
LOG=${1:-/tmp/sweep.log}
STALE=${2:-900}
ADOPT=${3:-}
CPUMIN=5
cd "$(dirname "$0")/.."

driver_cpu() {
    # cumulative CPU seconds of the sweep's python driver(s); read-only.
    ps -eo cputimes,args | awk '/run_(pretrain|finetune)\.py|data_collection|data_analysis|export_artifacts/ && !/awk/ {s+=$1} END {print s+0}'
}

kill_tree() {
    # Depth-first kill of $1's descendants, then $1, by exact PID walk —
    # never by pattern. With --isolate the trainer is a grandchild of the
    # wrapper (wrapper → python parent → isolate child); killing only the
    # direct child would orphan the trainer, which keeps the exclusive chip.
    local sig=$2 c
    for c in $(pgrep -P "$1" 2>/dev/null); do kill_tree "$c" "$sig"; done
    kill "$sig" "$1" 2>/dev/null
}

while true; do
  if [ -n "$ADOPT" ] && kill -0 "$ADOPT" 2>/dev/null; then
    PID=$ADOPT
    echo "watchdog: adopted sweep wrapper pid $PID $(date -u +%FT%TZ)"
  else
    bash scripts/production_sweep.sh >> "$LOG" 2>&1 &
    PID=$!
    echo "watchdog: sweep wrapper pid $PID $(date -u +%FT%TZ)"
  fi
  ADOPT=""
  CPU_PREV=$(driver_cpu)
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    CPU_NOW=$(driver_cpu)
    CPU_DELTA=$(( CPU_NOW - CPU_PREV ))
    CPU_PREV=$CPU_NOW
    if [ "$AGE" -gt "$STALE" ] && [ "$CPU_DELTA" -lt "$CPUMIN" ]; then
      echo "watchdog: log stale ${AGE}s and driver CPU frozen (+${CPU_DELTA}s/60s) — restarting sweep $(date -u +%FT%TZ)"
      kill_tree "$PID" -TERM
      sleep 5
      kill_tree "$PID" -9
      break
    fi
  done
  if grep -q "=== LP stretch done" "$LOG" 2>/dev/null; then
    echo "watchdog: sweep pipeline complete incl. LP stretch $(date -u +%FT%TZ)"
    exit 0
  fi
  echo "watchdog: sweep wrapper exited or was restarted; relaunching in 30s"
  sleep 30
done
