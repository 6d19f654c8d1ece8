#!/bin/bash
# Round-3 validation queue: serial TPU runs, started automatically when the
# gv_memory.7x7 5-seed sweep (the PID in $1) releases the chip.  Ordered by
# VERDICT r2 priority; every job carries a --time-limit so it checkpoints
# and exits rather than overrunning the round; all runs are resumable.
set -u
cd /root/repo
WAIT_PID="${1:-}"
LOGDIR=policies/r3_queue
mkdir -p "$LOGDIR"

log() { echo "[$(date '+%H:%M:%S')] $*" | tee -a "$LOGDIR/queue.log"; }

if [ -n "$WAIT_PID" ]; then
  log "waiting for PID $WAIT_PID to finish"
  while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
  log "gv sweep done; starting queue"
fi

run() {
  name="$1"; shift
  log "START $name: $*"
  python run.py "$@" >> "$LOGDIR/$name.log" 2>&1
  log "END $name (exit $?)"
}

# 0. Extend the gv sweep to 3M if its 2M curve is still climbing
# (VERDICT item 1; policy-seeded continuation, see tools/maybe_extend_gv.py)
log "START maybe-extend-gv"
python tools/maybe_extend_gv.py >> "$LOGDIR/gv_extend.log" 2>&1
log "END maybe-extend-gv (exit $?)"

# 2. Finish the round-2 runs (VERDICT item 2; heavenhell ran out-of-band)
run memory5 --envs Memory-5-v0 --seed 1 --project-name validation \
  --save-policy --verbose --disable-wandb --time-limit 0.6

# 3. Device-trace capture for the latency-floor analysis (VERDICT item 3b/3c)
log "START profile capture"
python run.py --envs DiscreteCarFlag-v0 --in-embed 64 --seed 9 \
  --num-steps 60000 --project-name profcap --profile-dir policies/r3_queue/prof \
  --save-policy --verbose --disable-wandb --time-limit 0.2 \
  >> "$LOGDIR/profcap.log" 2>&1
log "END profile capture (exit $?)"

# 4. DTQN-bag gv7x7 rerun, 2 seeds to a full 2M (VERDICT weak #3)
run bag --envs gv_memory.7x7.yaml --bag-size 25 --seeds 1 2 \
  --project-name sweep --save-policy --verbose --disable-wandb \
  --time-limit 1.3

# 5+6. Learning evidence for the recurrent families (VERDICT item 4)
run drqn --envs DiscreteCarFlag-v0 --model DRQN --in-embed 64 \
  --seeds 1 2 3 --num-steps 1000000 --project-name sweep --save-policy \
  --verbose --disable-wandb --time-limit 0.9
run adrqn --envs DiscreteCarFlag-v0 --model ADRQN --in-embed 64 --a-embed 8 \
  --seeds 1 2 3 --num-steps 1000000 --project-name sweep --save-policy \
  --verbose --disable-wandb --time-limit 0.9

# 7. Bench rows for the BENCH/VALIDATION artifacts (VERDICT item 3a)
log "START bench (default + extras, then bag)"
python bench.py > "$LOGDIR/bench_default.json" 2>> "$LOGDIR/bench.log"
python bench.py --bag 25 > "$LOGDIR/bench_bag.json" 2>> "$LOGDIR/bench.log"
log "END bench"

# 8. Hallway curve on the vendored .pomdp tables (VERDICT item 5)
run hallway --envs POMDP-hallway-episodic-v0 --in-embed 64 --seeds 1 2 3 \
  --num-steps 1000000 --project-name sweep --save-policy --verbose \
  --disable-wandb --time-limit 0.7

# 9. Multi-domain config on hardware (VERDICT item 6, BASELINE configs[4])
run multidomain --envs gv_memory_four_rooms.7x7.yaml gv_memory_four_rooms.9x9.yaml \
  --seed 1 --project-name validation --save-policy --verbose \
  --disable-wandb --time-limit 1.1

# 10. Image/CNN pixel-domain run (VERDICT item 7 compensating evidence)
run imagemaze --envs ImageMaze-9-v0 --seed 1 --num-steps 1000000 \
  --project-name validation --save-policy --verbose --disable-wandb \
  --time-limit 0.8

# 11. Dead-head mitigation science: tuf=1000, 5 seeds (VERDICT item 8)
run tuf1000 --envs DiscreteCarFlag-v0 --in-embed 64 --seeds 1 2 3 4 5 \
  --tuf 1000 --num-steps 1000000 --project-name tuf1000 --save-policy \
  --verbose --disable-wandb --time-limit 0.8

# 12. Host-loop trainer on the real chip (E6 machinery evidence)
log "START host-loop TPU smoke"
python tools/host_loop_tpu_smoke.py 50000 >> "$LOGDIR/hostloop.log" 2>&1
log "END host-loop TPU smoke (exit $?)"

log "queue complete"
