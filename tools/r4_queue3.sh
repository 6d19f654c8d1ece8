#!/bin/bash
# Round-4 queue, part 3 (revised): waits for queue2 (PID $1), then runs
#   1. masked-bag-attention ablation, gv7x7, 2 seeds x 2M (VERDICT item 2)
#   2. fspawn winner arm extended to 2M via sweep-checkpoint resume
#      (VERDICT item 1 full-length run of the winning config)
#   3. family evidence (VERDICT item 4): ADRQN/DRQN tuf=1000 resumed
#      600k -> 1M, HeavenHell at tuf=1000, DQN on Memory-5, DARQN on
#      CarFlag
#   4. sumenc encoding arm (VERDICT item 1c)
# Every job runs under the per-PID stall watchdog and carries a
# --time-limit so it checkpoints rather than overrunning; all resumable.
set -u
cd /root/repo
WAIT_PID="${1:-}"
LOGDIR=policies/r4_queue
mkdir -p "$LOGDIR"
log() { echo "[$(date '+%H:%M:%S')] $*" | tee -a "$LOGDIR/queue.log"; }

if [ -n "$WAIT_PID" ]; then
  log "queue3 waiting for PID $WAIT_PID (queue2)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

tools/r4_run_watched.sh bagmask \
  --envs gv_memory.7x7.yaml --bag-size 25 --bag-mask --seeds 1 2 \
  --num-steps 2000000 --project-name r4bagmask --save-policy --verbose \
  --disable-wandb --time-limit 1.6

tools/r4_run_watched.sh fspawn_2m \
  --envs gv_memory.7x7.yaml+fspawn --seeds 1 2 3 --num-steps 2000000 \
  --project-name r4ablate --save-policy --verbose --disable-wandb \
  --time-limit 0.9

tools/r4_run_watched.sh adrqn_extend \
  --envs DiscreteCarFlag-v0 --model ADRQN --in-embed 64 --a-embed 8 \
  --tuf 1000 --seeds 1 2 3 --num-steps 1000000 --project-name tuf1000 \
  --save-policy --verbose --disable-wandb --time-limit 0.45

tools/r4_run_watched.sh drqn_extend \
  --envs DiscreteCarFlag-v0 --model DRQN --in-embed 64 \
  --tuf 1000 --seeds 1 2 3 --num-steps 1000000 --project-name tuf1000 \
  --save-policy --verbose --disable-wandb --time-limit 0.45

tools/r4_run_watched.sh hh_tuf1000 \
  --envs POMDP-heavenhell_3-episodic-v0 --in-embed 64 --tuf 1000 \
  --max-episode-steps 50 --seeds 1 2 --num-steps 1000000 \
  --project-name tuf1000 --save-policy --verbose --disable-wandb \
  --time-limit 0.5

tools/r4_run_watched.sh dqn_memory5 \
  --envs Memory-5-v0 --model DQN --seeds 1 2 --num-steps 500000 \
  --project-name r4family --save-policy --verbose --disable-wandb \
  --time-limit 0.4

tools/r4_run_watched.sh darqn_carflag \
  --envs DiscreteCarFlag-v0 --model DARQN --in-embed 64 --seeds 1 2 3 \
  --num-steps 500000 --project-name r4family --save-policy --verbose \
  --disable-wandb --time-limit 0.5

tools/r4_run_watched.sh sumenc \
  --envs gv_memory.7x7.yaml+sumenc --seeds 1 2 3 --num-steps 1000000 \
  --project-name r4ablate --save-policy --verbose --disable-wandb \
  --time-limit 1.0

log "queue3 complete"
