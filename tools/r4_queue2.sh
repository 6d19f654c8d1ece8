#!/bin/bash
# Round-4 queue, part 2: wait for the fspawn-arm watcher (PID $1), then
# run the walkbeacon arm and a bench (measures the one-gather replay
# sampling experiment + exercises the hardened flagless extras path).
set -u
cd /root/repo
WAIT_PID="${1:-}"
LOGDIR=policies/r4_queue
mkdir -p "$LOGDIR"
log() { echo "[$(date '+%H:%M:%S')] $*" | tee -a "$LOGDIR/queue.log"; }

if [ -n "$WAIT_PID" ]; then
  log "queue2 waiting for PID $WAIT_PID (fspawn arm)"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 30; done
fi

tools/r4_run_watched.sh walkbeacon \
  --envs gv_memory.7x7.yaml+walkbeacon --seeds 1 2 3 --num-steps 1000000 \
  --project-name r4ablate --save-policy --verbose --disable-wandb \
  --time-limit 1.15

log "START bench (flagless, one-gather sampling experiment)"
python bench.py > "$LOGDIR/bench_r4_gather.json" 2>> "$LOGDIR/bench.log"
log "END bench (exit $?)"
cat "$LOGDIR/bench_r4_gather.json" >> "$LOGDIR/queue.log"
log "queue2 complete"
