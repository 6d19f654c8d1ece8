#!/bin/bash
# Round-5 extension queue — launch ONLY after tools/r5_queue.sh completes
# (policies/r5_queue/QUEUE_DONE exists).  Same setsid/PID discipline.
# Ordered by what must land before round end:
#   1. gv curriculum fine-tune take 2 (queue-1 slot lost to the tool's
#      missing mkdir; stacked checkpoint rebuilt on CPU at 2,001,792)
#   2. bagstore seeds 3-4 x 2M (divergence-frequency estimate)
#   3. flagless bench at the new defaults -> local round-5 record
#   4. HeavenHell --eps-min 0.3 mitigation arm
#   5. re-run the probe that hit a transient remote-compile error
set -u
cd /root/repo
LOGDIR=policies/r5_queue
W=tools/r5_run_watched.sh

echo "=== r5 queue2 start $(date '+%F %H:%M:%S') ==="

bash $W curriculum --envs gv_memory.7x7.yaml --seeds 1 2 3 \
  --num-steps 2500000 --project-name r5curr \
  --save-policy --disable-wandb --verbose

bash $W bagstore34 --envs gv_memory.7x7.yaml --bag-size 25 --bag-store \
  --seeds 3 4 --num-steps 2000000 --project-name r5bag \
  --save-policy --disable-wandb --verbose

echo "[bench] flagless (new defaults, extras included)"
python bench.py > "$LOGDIR/bench_final.json" 2>>"$LOGDIR/probes.err"
cat "$LOGDIR/bench_final.json"

# HeavenHell loiter-breaking mitigation (non-parity, behind --eps-min):
# the num_envs=1 arm reproduced the loiter lock under the reference's
# exact serial data process, so vectorization is exonerated; this tests
# the one mitigation VERDICT r4 named (higher act-time exploration floor).
bash $W hh_epsmin --envs POMDP-heavenhell_3-episodic-v0 --in-embed 64 \
  --max-episode-steps 50 --eps-min 0.3 --seeds 1 2 --num-steps 1000000 \
  --project-name r5hh_epsmin --save-policy --disable-wandb --verbose

echo "[probe] bench.py --unroll 4 --outer-unroll 2 (rerun)"
python bench.py --unroll 4 --outer-unroll 2 2>>"$LOGDIR/probes.err" \
  | tail -1 | sed 's|^|[probe --unroll 4 --outer-unroll 2] |'

echo "=== r5 queue2 done $(date '+%F %H:%M:%S') ==="
touch "$LOGDIR/QUEUE2_DONE"
