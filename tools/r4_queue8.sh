#!/bin/bash
# Round-4 last-last tail: waits for queue7 (PID $1), then widens the
# fspawn winner to the reference's 5-seed protocol with seeds 4-5
# (sacrificial — whatever lands before round end is still evidence).
set -u
cd /root/repo
WAIT_PID="${1:-}"
LOGDIR=policies/r4_queue
log() { echo "[$(date '+%H:%M:%S')] $*" | tee -a "$LOGDIR/queue.log"; }
if [ -n "$WAIT_PID" ]; then
  log "queue8 waiting for PID $WAIT_PID (queue7)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi
tools/r4_run_watched.sh fspawn_s45 \
  --envs gv_memory.7x7.yaml+fspawn --seeds 4 5 --num-steps 1000000 \
  --project-name r4ablate --save-policy --verbose --disable-wandb \
  --time-limit 0.6
log "queue8 complete"
