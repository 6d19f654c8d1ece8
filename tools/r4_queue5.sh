#!/bin/bash
# Round-4 queue, part 5 (replaces the tangled queue3/queue4 chains after
# the duplicate-bagmask incident): waits for the running adrqn watcher
# (PID $1), then runs the remaining round-4 docket in priority order.
set -u
cd /root/repo
WAIT_PID="${1:-}"
LOGDIR=policies/r4_queue
mkdir -p "$LOGDIR"
log() { echo "[$(date '+%H:%M:%S')] $*" | tee -a "$LOGDIR/queue.log"; }

if [ -n "$WAIT_PID" ]; then
  log "queue5 waiting for PID $WAIT_PID (adrqn watcher)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

tools/r4_run_watched.sh fspawn_2m \
  --envs gv_memory.7x7.yaml+fspawn --seeds 1 2 3 --num-steps 2000000 \
  --project-name r4ablate --save-policy --verbose --disable-wandb \
  --time-limit 0.9

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

log "START bench --unroll 4 (update-scan unroll experiment)"
python bench.py --unroll 4 > "$LOGDIR/bench_unroll4.json" 2>> "$LOGDIR/bench.log"
log "END bench --unroll 4 (exit $?)"
cat "$LOGDIR/bench_unroll4.json" >> "$LOGDIR/queue.log"

tools/r4_run_watched.sh sumenc \
  --envs gv_memory.7x7.yaml+sumenc --seeds 1 2 3 --num-steps 1000000 \
  --project-name r4ablate --save-policy --verbose --disable-wandb \
  --time-limit 0.9

tools/r4_run_watched.sh hallway_classic \
  --envs POMDP-hallway-episodic-v0 --in-embed 64 --seeds 1 2 3 \
  --num-steps 1000000 --project-name r4family --save-policy --verbose \
  --disable-wandb --time-limit 0.6

tools/r4_run_watched.sh multidomain_fspawn \
  --envs gv_memory_four_rooms.7x7.yaml+fspawn gv_memory_four_rooms.9x9.yaml+fspawn \
  --seed 1 --num-steps 2000000 --project-name r4ablate --save-policy \
  --verbose --disable-wandb --time-limit 0.8

log "queue5 complete"
