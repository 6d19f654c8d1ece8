#!/bin/bash
# Round-4 queue, part 6 (tail): waits for queue5 (PID $1), then the two
# follow-ups the round-4 results motivated: DARQN at tuf=1000 (the
# dead-head mitigation the other recurrents got) and HeavenHell at an
# intermediate tuf=5000 (between the tuf=10k loiter mode and the
# tuf=1000 divergence). Sacrificial if the round ends first.
set -u
cd /root/repo
WAIT_PID="${1:-}"
LOGDIR=policies/r4_queue
mkdir -p "$LOGDIR"
log() { echo "[$(date '+%H:%M:%S')] $*" | tee -a "$LOGDIR/queue.log"; }

if [ -n "$WAIT_PID" ]; then
  log "queue6 waiting for PID $WAIT_PID (queue5)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

tools/r4_run_watched.sh darqn_tuf1000 \
  --envs DiscreteCarFlag-v0 --model DARQN --in-embed 64 --tuf 1000 \
  --seeds 1 2 3 --num-steps 500000 --project-name tuf1000 \
  --save-policy --verbose --disable-wandb --time-limit 0.4

tools/r4_run_watched.sh hh_tuf5000 \
  --envs POMDP-heavenhell_3-episodic-v0 --in-embed 64 --tuf 5000 \
  --max-episode-steps 50 --seeds 1 2 --num-steps 1000000 \
  --project-name tuf5000 --save-policy --verbose --disable-wandb \
  --time-limit 0.45

log "queue6 complete"
