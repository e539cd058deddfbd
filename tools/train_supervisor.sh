#!/bin/bash
# Supervise a long train_demo.py run against a flaky device tunnel.
#
# Launches tools/train_demo.py with "$@", then watches its log: if the
# process exits before reaching --steps, or the log goes stale for
# STALL_S seconds (a wedged tunnel leaves the process alive but hung),
# kill it BY PID (never by pattern) and relaunch with --resume so it
# restores the latest orbax checkpoint.  Exits when the run completes
# (process exits AND the final "saved artifacts" line is in the log) or
# MAX_RESTARTS is hit.
#
# Each launch writes to its OWN log file ($OUTDIR/train.launch<N>.log):
# the completion sentinel and the stall mtime are checked against the
# current launch only, so relaunching the supervisor on an outdir whose
# previous run completed trains instead of exiting immediately, and the
# supervisor's own writes can't mask a stalled trainer.  train.log stays
# the combined view (trainer output is tee'd into it).
#
# Usage: tools/train_supervisor.sh <outdir> [train_demo args...]
set -u
OUTDIR="$1"; shift
LOG="$OUTDIR/train.log"
PIDFILE="$OUTDIR/train.pid"
STALL_S=${STALL_S:-900}
MAX_RESTARTS=${MAX_RESTARTS:-40}
mkdir -p "$OUTDIR"

restarts=0
RESUME=""
# a previous (pre-supervisor) run may have left checkpoints
if [ -d "$OUTDIR/orbax" ] && [ -n "$(ls -A "$OUTDIR/orbax" 2>/dev/null)" ]; then
  RESUME="--resume"
fi

launch_id=$(date +%s)
while [ "$restarts" -le "$MAX_RESTARTS" ]; do
  LLOG="$OUTDIR/train.launch${launch_id}.${restarts}.log"
  : > "$LLOG"
  echo "[supervisor] launch #$restarts $(date -u +%H:%M:%S) resume='$RESUME' log=$LLOG" >> "$LOG"
  python tools/train_demo.py --outdir "$OUTDIR" $RESUME "$@" > "$LLOG" 2>&1 &
  pid=$!
  echo "$pid" > "$PIDFILE"
  while kill -0 "$pid" 2>/dev/null; do
    sleep 60
    now=$(date +%s)
    mt=$(stat -c %Y "$LLOG" 2>/dev/null || echo "$now")
    if [ $((now - mt)) -gt "$STALL_S" ]; then
      echo "[supervisor] log stale $((now - mt))s -- killing $pid" >> "$LOG"
      kill "$pid" 2>/dev/null
      sleep 10
      kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid" 2>/dev/null
  cat "$LLOG" >> "$LOG"
  if grep -q "saved artifacts to" "$LLOG"; then
    echo "[supervisor] run complete $(date -u +%H:%M:%S)" >> "$LOG"
    exit 0
  fi
  restarts=$((restarts + 1))
  RESUME="--resume"
  sleep 30
done
echo "[supervisor] gave up after $MAX_RESTARTS restarts" >> "$LOG"
exit 1
