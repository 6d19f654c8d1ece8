#!/bin/bash
# Round-4 last tail: waits for queue6b (PID $1), then the oracle
# diagnostic arm (sacrificial — whatever steps land before round end).
set -u
cd /root/repo
WAIT_PID="${1:-}"
LOGDIR=policies/r4_queue
log() { echo "[$(date '+%H:%M:%S')] $*" | tee -a "$LOGDIR/queue.log"; }
if [ -n "$WAIT_PID" ]; then
  log "queue7 waiting for PID $WAIT_PID (queue6b)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
tools/r4_run_watched.sh oracle \
  --envs gv_memory.7x7.yaml+oracle --seeds 1 2 3 --num-steps 1000000 \
  --project-name r4ablate --save-policy --verbose --disable-wandb \
  --time-limit 0.75
log "queue7 complete"
