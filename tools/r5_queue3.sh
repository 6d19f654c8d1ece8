#!/bin/bash
# Round-5 final-session queue (the machine was recycled mid-queue2:
# bagstore34 died at 65k/2M, bench_final + hh_epsmin never ran).
# Order, by what the round must not end without:
#   1. flagless bench at the new defaults -> local round-5 record
#      (the driver bench is the round's contract; this de-risks it)
#   2. HeavenHell --eps-min 0.3 mitigation arm (last open VERDICT item)
#   3. bagstore34 restart, deadline-aware --time-limit so it checkpoints
#      and exits cleanly before round end (partial divergence data +
#      resumable checkpoint beat no data)
# Same setsid/PID discipline as queue2; per-PID watchdog only.
set -u
cd /root/repo
LOGDIR=policies/r5_queue
W=tools/r5_run_watched.sh
# Hard deadline for TPU work: leave the chip idle for the driver bench.
DEADLINE=$(( $(date +%s) + 82*60 ))

echo "=== r5 queue3 start $(date '+%F %H:%M:%S') ===" | tee -a "$LOGDIR/queue.log"

echo "[bench] flagless (new defaults, extras included)" | tee -a "$LOGDIR/queue.log"
python bench.py > "$LOGDIR/bench_final.json" 2>>"$LOGDIR/probes.err"
echo "[bench] rc=$? $(cat "$LOGDIR/bench_final.json")" | tee -a "$LOGDIR/queue.log"

bash $W hh_epsmin --envs POMDP-heavenhell_3-episodic-v0 --in-embed 64 \
  --max-episode-steps 50 --eps-min 0.3 --seeds 1 2 --num-steps 1000000 \
  --project-name r5hh_epsmin --save-policy --disable-wandb --verbose

# bagstore34 restart: same seeds regenerate the killed run's first 65k
# steps bit-identically (measured stack determinism), so drop the
# orphaned partial CSVs (git history keeps them) instead of appending
# duplicates.
rem=$(( DEADLINE - $(date +%s) ))
if [ "$rem" -gt 900 ]; then
  rm -f policies/r5bag/gv_memory.7x7.yaml/*bagstore=True_seed=3_*.csv \
        policies/r5bag/gv_memory.7x7.yaml/*bagstore=True_seed=4_*.csv
  tl=$(python3 -c "print(round(max(0.1, $rem/3600 - 0.05), 2))")
  echo "[queue3] bagstore34 restart with --time-limit $tl h" | tee -a "$LOGDIR/queue.log"
  bash $W bagstore34r --envs gv_memory.7x7.yaml --bag-size 25 --bag-store \
    --seeds 3 4 --num-steps 2000000 --time-limit "$tl" \
    --project-name r5bag --save-policy --disable-wandb --verbose
else
  echo "[queue3] skipping bagstore34 restart (only ${rem}s to deadline)" | tee -a "$LOGDIR/queue.log"
fi

echo "=== r5 queue3 done $(date '+%F %H:%M:%S') ===" | tee -a "$LOGDIR/queue.log"
touch "$LOGDIR/QUEUE3_DONE"
