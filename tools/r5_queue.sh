#!/bin/bash
# Round-5 sequential TPU queue (one job at a time — the chip and the 2 CPU
# cores cannot take concurrent heavy jobs, CLAUDE.md).  Launch with:
#   setsid bash tools/r5_queue.sh >> policies/r5_queue/queue.log 2>&1 &
# then record the REAL script PID via `pgrep -af r5_queue.sh`.
#
# Jobs, in VERDICT-r4 priority order:
#   0. perf probes: bench.py unroll/outer-unroll variants (item 7)
#   1. bag-store ablation: gv7x7 bag=25 --bag-store, 2 seeds x 2M (item 2)
#   2. HeavenHell num_envs=1 parity-data arm, 2 seeds x 1M (item 3)
#   3. gv curriculum fine-tune: fspawn-2M policies -> original resets (item 6)
#   4. vectorized-actor matrix: num_envs {1,8,64} x {CarFlag, gv7x7} (item 4)
#   5. HeavenHell num_envs=4 arm (item 3 extension)
set -u
cd /root/repo
LOGDIR=policies/r5_queue
mkdir -p "$LOGDIR"
W=tools/r5_run_watched.sh

echo "=== r5 queue start $(date '+%F %H:%M:%S') ==="

# --- 0: perf probes (short; each prints one JSON line) -------------------
for probe in "--unroll 8" "--unroll 8 --outer-unroll 2" "--unroll 4 --outer-unroll 2" "--unroll 8 --outer-unroll 4"; do
  echo "[probe] bench.py $probe"
  python bench.py $probe 2>>"$LOGDIR/probes.err" | tail -1 | sed "s|^|[probe $probe] |"
done

# --- 1: bag-store 2 seeds x 2M ------------------------------------------
bash $W bagstore --envs gv_memory.7x7.yaml --bag-size 25 --bag-store \
  --seeds 1 2 --num-steps 2000000 --project-name r5bag \
  --save-policy --disable-wandb --verbose

# --- 2: HeavenHell num_envs=1 (the reference's serial-env data process) --
bash $W hh_ne1 --envs POMDP-heavenhell_3-episodic-v0 --in-embed 64 \
  --max-episode-steps 50 --num-envs 1 --seeds 1 2 --num-steps 1000000 \
  --project-name r5hh_ne1 --save-policy --disable-wandb --verbose

# --- 3: gv curriculum: fspawn 2M -> fine-tune on original resets ---------
python tools/seed_sweep_checkpoint.py --envs gv_memory.7x7.yaml \
  --seeds 1 2 3 --at-step 2001792 \
  --from-envs gv_memory.7x7.yaml+fspawn --from-project r4ablate \
  --restart-epsilon 0.1 --project-name r5curr --num-steps 2500000 \
  >> "$LOGDIR/curriculum_ckpt.log" 2>&1
bash $W curriculum --envs gv_memory.7x7.yaml --seeds 1 2 3 \
  --num-steps 2500000 --project-name r5curr \
  --save-policy --disable-wandb --verbose

# --- 4: vectorized-actor matrix (500k budget, 2 seeds each) --------------
for ne in 1 8 64; do
  bash $W mx_cf_ne$ne --envs DiscreteCarFlag-v0 --in-embed 64 \
    --num-envs $ne --seeds 1 2 --num-steps 500000 \
    --project-name r5mx_cf_ne$ne --disable-wandb --verbose
done
for ne in 1 8 64; do
  bash $W mx_gv_ne$ne --envs gv_memory.7x7.yaml \
    --num-envs $ne --seeds 1 2 --num-steps 500000 \
    --project-name r5mx_gv_ne$ne --disable-wandb --verbose
done

# --- 5: HeavenHell num_envs=4 -------------------------------------------
bash $W hh_ne4 --envs POMDP-heavenhell_3-episodic-v0 --in-embed 64 \
  --max-episode-steps 50 --num-envs 4 --seeds 1 2 --num-steps 1000000 \
  --project-name r5hh_ne4 --save-policy --disable-wandb --verbose

echo "=== r5 queue done $(date '+%F %H:%M:%S') ==="
touch "$LOGDIR/QUEUE_DONE"
