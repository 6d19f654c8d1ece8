#!/bin/bash
# Run ONE TPU training job under a stall watchdog scoped to that job's PID.
#
#   tools/r5_run_watched.sh <name> [run.py args...]
#
# Round-3 lesson (VERDICT weak #4): the old watchdog pattern-matched any
# `python (run|bench).py` and killed the driver's bench process.  This one
# only ever signals the exact child it started.  TPU-tunnel stalls (the
# process blocks forever inside a device call while the chip stays healthy
# for new processes) are detected by artifact staleness: no file under
# policies/ modified for STALL_MIN minutes while the job is alive.
#
# Round-4 advisor fix: NO SIGKILL escalation.  SIGKILLing a process blocked
# in a device call can wedge the TPU grant (CLAUDE.md), and a tunnel-stalled
# process does not occupy the chip — so after one SIGTERM + grace period the
# child is ABANDONED (logged with its PID for end-of-round cleanup) and the
# wrapper exits 124 so the queue can continue on the healthy chip.
# STALL_MIN default 30 (round 5): cold remote chunk compiles take many
# minutes with no artifact writes, and redirected python stdout is
# block-buffered — 14 min false-killed healthy compiling jobs' margin.
# `python -u` unbuffers the job log so chunk lines count as activity.
set -u
STALL_MIN="${STALL_MIN:-30}"
cd /root/repo
NAME="$1"; shift
LOGDIR=policies/r5_queue
mkdir -p "$LOGDIR"

echo "[$(date '+%H:%M:%S')] START $NAME: $*" | tee -a "$LOGDIR/queue.log"
python -u run.py "$@" >> "$LOGDIR/$NAME.log" 2>&1 &
PID=$!

while kill -0 "$PID" 2>/dev/null; do
  sleep 60
  newest=$(find policies -type f -newermt "-${STALL_MIN} min" 2>/dev/null | head -1)
  if [ -z "$newest" ] && kill -0 "$PID" 2>/dev/null; then
    echo "[$(date '+%H:%M:%S')] $NAME: no artifact activity for ${STALL_MIN}m; SIGTERM PID $PID" \
      | tee -a "$LOGDIR/queue.log"
    kill "$PID" 2>/dev/null
    sleep 60
    if kill -0 "$PID" 2>/dev/null; then
      echo "[$(date '+%H:%M:%S')] $NAME: PID $PID ignored SIGTERM (stalled in device call); ABANDONED — clean up at end of round" \
        | tee -a "$LOGDIR/queue.log"
      exit 124
    fi
  fi
done
wait "$PID"
RC=$?
echo "[$(date '+%H:%M:%S')] END $NAME (exit $RC)" | tee -a "$LOGDIR/queue.log"
exit "$RC"
