#!/bin/bash
# Final round-3 tail: recurrent-family mitigation runs + HeavenHell finish.
set -u
cd /root/repo
LOGDIR=policies/r3_queue
log() { echo "[$(date '+%H:%M:%S')] $*" | tee -a "$LOGDIR/queue.log"; }

log "START drqn-tuf1000"
python run.py --envs DiscreteCarFlag-v0 --model DRQN --in-embed 64 \
  --tuf 1000 --seeds 1 2 3 --num-steps 600000 --project-name tuf1000 \
  --save-policy --verbose --disable-wandb --time-limit 0.35 \
  >> "$LOGDIR/drqn_tuf1000.log" 2>&1
log "END drqn-tuf1000 (exit $?)"

log "START adrqn-tuf1000"
python run.py --envs DiscreteCarFlag-v0 --model ADRQN --in-embed 64 \
  --a-embed 8 --tuf 1000 --seeds 1 2 3 --num-steps 600000 \
  --project-name tuf1000 --save-policy --verbose --disable-wandb \
  --time-limit 0.35 >> "$LOGDIR/adrqn_tuf1000.log" 2>&1
log "END adrqn-tuf1000 (exit $?)"

log "START heavenhell-finish"
python run.py --envs POMDP-heavenhell_3-episodic-v0 --in-embed 64 --seed 1 \
  --max-episode-steps 50 --project-name validation --save-policy --verbose \
  --disable-wandb --time-limit 0.2 >> "$LOGDIR/heavenhell.log" 2>&1
log "END heavenhell-finish (exit $?)"
log "tail2 complete"
