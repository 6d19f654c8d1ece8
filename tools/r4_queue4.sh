#!/bin/bash
# Round-4 queue, part 4: waits for queue3 (PID $1), then runs
#   1. Hallway training on the upgraded classic-dimension tables
#      (VERDICT item 8: "train against them")
#   2. multidomain four_rooms rerun with the winning gv variant
#      (VERDICT item 6)
#   3. oracle diagnostic arm (upper bound for the gv reconstruction)
# Ordered by priority; later jobs are sacrificial if the round ends.
set -u
cd /root/repo
WAIT_PID="${1:-}"
LOGDIR=policies/r4_queue
mkdir -p "$LOGDIR"
log() { echo "[$(date '+%H:%M:%S')] $*" | tee -a "$LOGDIR/queue.log"; }

if [ -n "$WAIT_PID" ]; then
  log "queue4 waiting for PID $WAIT_PID (queue3)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

log "START bench --unroll 4 (update-scan unroll experiment)"
python bench.py --unroll 4 > "$LOGDIR/bench_unroll4.json" 2>> "$LOGDIR/bench.log"
log "END bench --unroll 4 (exit $?)"
cat "$LOGDIR/bench_unroll4.json" >> "$LOGDIR/queue.log"

tools/r4_run_watched.sh hallway_classic \
  --envs POMDP-hallway-episodic-v0 --in-embed 64 --seeds 1 2 3 \
  --num-steps 1000000 --project-name r4family --save-policy --verbose \
  --disable-wandb --time-limit 0.6

tools/r4_run_watched.sh multidomain_fspawn \
  --envs gv_memory_four_rooms.7x7.yaml+fspawn \
         gv_memory_four_rooms.9x9.yaml+fspawn \
  --seed 1 --num-steps 2000000 --project-name r4ablate --save-policy \
  --verbose --disable-wandb --time-limit 1.0

tools/r4_run_watched.sh oracle \
  --envs gv_memory.7x7.yaml+oracle --seeds 1 2 3 --num-steps 1000000 \
  --project-name r4ablate --save-policy --verbose --disable-wandb \
  --time-limit 1.0

log "queue4 complete"
