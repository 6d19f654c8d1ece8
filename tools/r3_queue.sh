#!/bin/bash
# Round-3 validation queue: serial TPU runs, started automatically when the
# gv_memory.7x7 5-seed sweep (the PID in $1) releases the chip.
# Every job carries a --time-limit so it checkpoints and exits rather than
# overrunning the round; all runs are resumable.
set -u
cd /root/repo
WAIT_PID="${1:-}"
LOGDIR=policies/r3_queue
mkdir -p "$LOGDIR"

log() { echo "[$(date '+%H:%M:%S')] $*" | tee -a "$LOGDIR/queue.log"; }

if [ -n "$WAIT_PID" ]; then
  log "waiting for PID $WAIT_PID (gv sweep) to finish"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  log "gv sweep done; starting queue"
fi

run() {
  name="$1"; shift
  log "START $name: $*"
  python run.py "$@" >> "$LOGDIR/$name.log" 2>&1
  log "END $name (exit $?)"
}

# 1. Finish HeavenHell 1.76M -> 2M (VERDICT missing #1)
run heavenhell --envs POMDP-heavenhell_3-episodic-v0 --in-embed 64 --seed 1 \
  --max-episode-steps 50 --project-name validation --save-policy --verbose \
  --disable-wandb --time-limit 0.3

# 2. Finish Memory-5 284k -> 2M
run memory5 --envs Memory-5-v0 --seed 1 --project-name validation \
  --save-policy --verbose --disable-wandb --time-limit 0.6

# 3. DTQN-bag gv7x7 rerun, 2 seeds to a full 2M (VERDICT weak #3)
run bag --envs gv_memory.7x7.yaml --bag-size 25 --seeds 1 2 \
  --project-name sweep --save-policy --verbose --disable-wandb \
  --time-limit 1.3

# 4+5. Learning evidence for the recurrent families (VERDICT missing #3)
run drqn --envs DiscreteCarFlag-v0 --model DRQN --in-embed 64 \
  --seeds 1 2 3 --num-steps 1000000 --project-name sweep --save-policy \
  --verbose --disable-wandb --time-limit 0.9
run adrqn --envs DiscreteCarFlag-v0 --model ADRQN --in-embed 64 --a-embed 8 \
  --seeds 1 2 3 --num-steps 1000000 --project-name sweep --save-policy \
  --verbose --disable-wandb --time-limit 0.9

# 6. Hallway curve on the vendored .pomdp tables (VERDICT missing #4)
run hallway --envs POMDP-hallway-episodic-v0 --in-embed 64 --seeds 1 2 3 \
  --num-steps 1000000 --project-name sweep --save-policy --verbose \
  --disable-wandb --time-limit 0.7

# 7. Multi-domain config on hardware (VERDICT missing #1, BASELINE configs[4])
run multidomain --envs gv_memory_four_rooms.7x7.yaml gv_memory_four_rooms.9x9.yaml \
  --seed 1 --project-name validation --save-policy --verbose \
  --disable-wandb --time-limit 1.1

# 8. Dead-head mitigation science: tuf=1000, 5 seeds (VERDICT item 8)
run tuf1000 --envs DiscreteCarFlag-v0 --in-embed 64 --seeds 1 2 3 4 5 \
  --tuf 1000 --num-steps 1000000 --project-name tuf1000 --save-policy \
  --verbose --disable-wandb --time-limit 0.8

# 9. Image/CNN pixel-domain run (VERDICT missing #2 compensating evidence)
run imagemaze --envs ImageMaze-9-v0 --seed 1 --num-steps 1000000 \
  --project-name validation --save-policy --verbose --disable-wandb \
  --time-limit 0.8

log "queue complete"
