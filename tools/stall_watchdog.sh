#!/bin/bash
# Tunnel-stall watchdog: if no file under policies/ (CSV/logs/checkpoints)
# has been modified for STALL_MIN minutes while a run.py/bench.py process
# exists, kill that process (the serial queue then advances).  Cold remote
# compiles can be silent for ~10 min, so the threshold is conservative.
STALL_MIN=14
cd /root/repo
while true; do
  sleep 60
  pid=$(pgrep -of "python (run|bench)\.py" 2>/dev/null)
  [ -z "$pid" ] && continue
  newest=$(find policies -type f -newermt "-${STALL_MIN} min" 2>/dev/null | head -1)
  if [ -z "$newest" ]; then
    echo "[watchdog $(date '+%H:%M:%S')] no artifact activity for ${STALL_MIN}m; killing $pid" >> policies/r3_queue/queue.log
    kill "$pid"
  fi
done
