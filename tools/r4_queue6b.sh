#!/bin/bash
# Round-4 final tail: waits for queue5 (PID $1), then
#   1. flagless bench with the new unroll=4 default (records the final
#      headline+extras and warms the persistent compile cache so the
#      driver's BENCH_r04 run compiles warm)
#   2. DARQN at tuf=1000 (revived-head counterpart to the 3/3 dead at
#      defaults)
#   3. HeavenHell at tuf=5000 (between the loiter mode and the
#      divergence) — sacrificial if the round ends first.
set -u
cd /root/repo
WAIT_PID="${1:-}"
LOGDIR=policies/r4_queue
mkdir -p "$LOGDIR"
log() { echo "[$(date '+%H:%M:%S')] $*" | tee -a "$LOGDIR/queue.log"; }

if [ -n "$WAIT_PID" ]; then
  log "queue6b waiting for PID $WAIT_PID (queue5)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

log "START final flagless bench (unroll=4 default)"
python bench.py > "$LOGDIR/bench_final.json" 2>> "$LOGDIR/bench.log"
log "END final flagless bench (exit $?)"
cat "$LOGDIR/bench_final.json" >> "$LOGDIR/queue.log"

tools/r4_run_watched.sh darqn_tuf1000 \
  --envs DiscreteCarFlag-v0 --model DARQN --in-embed 64 --tuf 1000 \
  --seeds 1 2 3 --num-steps 500000 --project-name tuf1000 \
  --save-policy --verbose --disable-wandb --time-limit 0.4

tools/r4_run_watched.sh hh_tuf5000 \
  --envs POMDP-heavenhell_3-episodic-v0 --in-embed 64 --tuf 5000 \
  --max-episode-steps 50 --seeds 1 2 --num-steps 1000000 \
  --project-name tuf5000 --save-policy --verbose --disable-wandb \
  --time-limit 0.45

log "queue6b complete"
