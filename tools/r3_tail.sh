#!/bin/bash
# End-of-round tail: finish short remainders after the main r3 queue.
set -u
cd /root/repo
LOGDIR=policies/r3_queue
log() { echo "[$(date '+%H:%M:%S')] $*" | tee -a "$LOGDIR/queue.log"; }

# HeavenHell: final 78k (1.92M -> 2M); cache is warm, ~3 min.
log "START heavenhell-finish"
python run.py --envs POMDP-heavenhell_3-episodic-v0 --in-embed 64 --seed 1 \
  --max-episode-steps 50 --project-name validation --save-policy --verbose \
  --disable-wandb --time-limit 0.25 >> "$LOGDIR/heavenhell.log" 2>&1
log "END heavenhell-finish (exit $?)"
