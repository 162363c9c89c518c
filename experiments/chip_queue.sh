#!/bin/bash
# Runs the on-chip measurement battery once the TPU tunnel is back.
cd /root/repo
LOG=/tmp/chip_queue.log
echo "=== chip queue (v2) started $(date) ===" >> "$LOG"

# 1) wait for the backend (probe every 5 min, up to 10h)
for i in $(seq 1 120); do
  if timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "TPU reachable after probe $i ($(date))" >> "$LOG"
    break
  fi
  echo "probe $i: TPU unreachable ($(date))" >> "$LOG"
  sleep 300
done

if ! timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
  echo "GIVING UP: TPU never became reachable" >> "$LOG"
  exit 1
fi

# 2) render bench (gnomonic headline)
echo "--- bench.py ($(date)) ---" >> "$LOG"
timeout 1800 python bench.py >> "$LOG" 2>&1

# 3) train bench (gnomonic whole-pose) + the q-split A/B
echo "--- bench_train.py ($(date)) ---" >> "$LOG"
timeout 1800 python bench_train.py >> "$LOG" 2>&1
echo "--- bench_train.py --qb ($(date)) ---" >> "$LOG"
timeout 1800 python bench_train.py --qb >> "$LOG" 2>&1

# 4) production quality gates (gnomonic + bricked + fast)
echo "--- quality gates ($(date)) ---" >> "$LOG"
timeout 3600 python -m pytest tests/test_production_quality.py -q >> "$LOG" 2>&1

# 5) gnomonic quality x speed sweep (pick the >=80 dB default)
echo "--- sweep_gnomonic_quality_speed ($(date)) ---" >> "$LOG"
timeout 3600 python experiments/sweep_gnomonic_quality_speed.py >> "$LOG" 2>&1

# 6) exit_eps=0 cost probe (VERDICT item 9)
echo "--- probe_exit_eps ($(date)) ---" >> "$LOG"
timeout 1800 python experiments/probe_exit_eps.py >> "$LOG" 2>&1

# 7) train-bench bricked mode (round-2 path, for the step-breakdown table)
echo "--- bench_train.py --bricked ($(date)) ---" >> "$LOG"
timeout 1800 python bench_train.py --bricked >> "$LOG" 2>&1

# 7b) gnomonic per-stage breakdown (render stages + train fwd/bwd split);
# the 4th arg is gnomonic_qb for the q-split A/B
echo "--- profile_gnomonic_pose ($(date)) ---" >> "$LOG"
timeout 1800 python experiments/profile_gnomonic_pose.py >> "$LOG" 2>&1
timeout 1800 python experiments/profile_gnomonic_pose.py 128 1 >> "$LOG" 2>&1
timeout 1800 python experiments/profile_gnomonic_pose.py 128 0 400 128 >> "$LOG" 2>&1
timeout 1800 python experiments/profile_gnomonic_pose.py 128 1 400 128 >> "$LOG" 2>&1

# 7c) parity-protocol re-run of the gnomonic trainer WITH the texel-density
# floor + k-pose accumulation (the CPU baseline without them: stage1 31.28 /
# final 35.52 vs classic 35.66 / 36.49 — PARITY_RUN.md)
echo "--- gnomonic parity re-run with floor ($(date)) ---" >> "$LOG"
timeout 5400 python apps/train_sh_voxel_grid.py -d /tmp/parity_ds2 -o /tmp/parity3_gn_floor \
  --separate_train_test_folders True --data_downsample_factor 1.0 \
  --grid_dims 64 64 64 --num_stages 2 --num_iterations_per_stage 500 \
  --render_procedure render_sh_voxel_grid_gnomonic --ray_batch_size 2048 \
  --save_frequency 500 --test_frequency 500 --feedback_frequency 500 \
  --summary_frequency 100 --fast_debug_mode False > /tmp/parity3_gn_floor.log 2>&1
grep "heldout PSNR" /tmp/parity3_gn_floor.log >> "$LOG"

echo "=== chip queue (v2) measurement battery done $(date) ===" >> "$LOG"
touch /tmp/chip_battery_done

# 8) canonical 256^3 recipe (hours) — last, so a tunnel flap can't eat the battery
echo "--- canonical 256^3 run ($(date)) ---" >> "$LOG"
ITERS=2000 timeout 28800 bash experiments/run_canonical_256.sh >> /tmp/canonical_256_run.log 2>&1
echo "canonical 256^3 rc=$? ($(date))" >> "$LOG"

echo "=== chip queue (v2) done $(date) ===" >> "$LOG"
touch /tmp/chip_queue_done
