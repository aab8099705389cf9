#!/bin/bash
# Babysits the production sweep: if the sweep log goes stale for STALE
# seconds the sweep is killed and relaunched. Observed failure mode: a relay
# RPC response is lost and the driver blocks forever in a futex wait with
# zero CPU while the TPU serves other clients fine. --resume + the
# fidelity-aware completion markers make a restart lossless except for the
# in-flight cell.
#
#   nohup bash scripts/sweep_watchdog.sh /tmp/sweep.log 900 > /tmp/watchdog.log 2>&1 &
#
# Exits when a full pipeline pass prints its "=== done" marker.
set -u
LOG=${1:-/tmp/sweep.log}
STALE=${2:-900}
cd "$(dirname "$0")/.."

while true; do
  bash scripts/production_sweep.sh >> "$LOG" 2>&1 &
  PID=$!
  echo "watchdog: sweep wrapper pid $PID $(date -u +%FT%TZ)"
  while kill -0 "$PID" 2>/dev/null; do
    sleep 60
    AGE=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
    if [ "$AGE" -gt "$STALE" ]; then
      echo "watchdog: log stale ${AGE}s — restarting sweep $(date -u +%FT%TZ)"
      pkill -P "$PID"        # the wrapper's direct child (the python driver)
      kill "$PID" 2>/dev/null
      sleep 5
      pkill -9 -P "$PID" 2>/dev/null
      kill -9 "$PID" 2>/dev/null
      break
    fi
  done
  if grep -q "^=== done" "$LOG"; then
    echo "watchdog: sweep completed $(date -u +%FT%TZ)"
    break
  fi
  sleep 30   # backoff: with the relay down each pass fails fast
done
