#!/bin/bash
# Round-3 continuation battery: runs AFTER bench.py frees the chip.
# Serialized — one TPU process at a time.
cd /root/repo || exit 1
LOG=/tmp/chip_queue2.log
if [ ! -d /tmp/parity_ds2 ]; then
  echo "missing /tmp/parity_ds2 (created by chip_queue.sh); aborting" >> "$LOG"
  exit 1
fi
echo "=== chip_queue2 started $(date) ===" >> "$LOG"

# 1) train bench (gnomonic whole-pose) — headline + breakdown
echo "--- bench_train.py ($(date)) ---" >> "$LOG"
timeout 1500 python bench_train.py >> "$LOG" 2>&1

# 2) gnomonic parity re-run WITH the texel-density floor + jitter fixes
#    (PARITY_RUN.md round-3 gap: gnomonic trainer -0.97 dB vs classic at 64^3)
echo "--- gnomonic parity re-run ($(date)) ---" >> "$LOG"
timeout 2400 python apps/train_sh_voxel_grid.py -d /tmp/parity_ds2 -o /tmp/parity3_gn_floor \
  --separate_train_test_folders True --data_downsample_factor 1.0 \
  --grid_dims 64 64 64 --num_stages 2 --num_iterations_per_stage 500 \
  --render_procedure render_sh_voxel_grid_gnomonic --ray_batch_size 2048 \
  --save_frequency 500 --test_frequency 500 --feedback_frequency 500 \
  --summary_frequency 100 --fast_debug_mode False > /tmp/parity3_gn_floor.log 2>&1
grep -i "psnr" /tmp/parity3_gn_floor.log | tail -6 >> "$LOG"
touch /tmp/q2_parity_done

# 3) production quality gates (accelerator-only tests)
echo "--- quality gates ($(date)) ---" >> "$LOG"
timeout 2400 python -m pytest tests/test_production_quality.py -q >> "$LOG" 2>&1
touch /tmp/q2_gates_done

echo "=== chip queue v3 battery done $(date) ===" >> "$LOG"
touch /tmp/chip_queue2_done
