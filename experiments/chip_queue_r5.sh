#!/bin/bash
# Round-5 on-chip battery, serialized (one TPU process at a time).
# Covers VERDICT round-4 items: train bench re-measure (#2), 128^3 gnomonic
# parity row (#6), canonical 256^3 recipe (#3), gate battery JSON (#4/#8),
# exit_eps=0 cost (#7). Renders benches first so a partial run still
# produces the headline numbers.
set -u
cd /root/repo || exit 1
LOG=/tmp/chip_queue_r5.log
echo "=== chip_queue_r5 started $(date) ===" >> "$LOG"

step() { echo "--- $1 ($(date)) ---" >> "$LOG"; }

step "bench.py"
timeout 1500 env BENCH_TIME_BUDGET=900 python -u bench.py > /tmp/q5_bench.log 2>&1
tail -4 /tmp/q5_bench.log >> "$LOG"

step "bench_train.py"
timeout 1500 python -u bench_train.py > /tmp/q5_bench_train.log 2>&1
tail -2 /tmp/q5_bench_train.log >> "$LOG"
touch /tmp/q5_bench_done

step "parity dataset 200px (1024-spp GT, 64^3 oracle)"
if [ ! -d /tmp/parity_ds3 ]; then
  timeout 1800 python tools/make_synthetic_dataset.py -o /tmp/parity_ds3 \
    --image_size 200 --grid_size 64 --gt_samples_per_ray 1024 >> "$LOG" 2>&1
fi

step "parity 128^3 gnomonic trainer (round-3 protocol, VERDICT #6)"
timeout 3600 python -u apps/train_sh_voxel_grid.py -d /tmp/parity_ds3 \
  -o /tmp/parity5_gn --separate_train_test_folders True \
  --data_downsample_factor 1.0 --grid_dims 128 128 128 --num_stages 3 \
  --num_iterations_per_stage 500 \
  --render_procedure render_sh_voxel_grid_gnomonic --ray_batch_size 2048 \
  --save_frequency 500 --test_frequency 500 --feedback_frequency 500 \
  --summary_frequency 100 --fast_debug_mode False \
  > /tmp/parity5_gn.log 2>&1
grep -i "psnr\|TIME CHECK" /tmp/parity5_gn.log | tail -8 >> "$LOG"
touch /tmp/q5_parity_done

step "gate battery -> GATES_r05.json"
timeout 3600 python -u tools/run_gate_battery.py --round 5 \
  > /tmp/q5_gates.log 2>&1
tail -3 /tmp/q5_gates.log >> "$LOG"
touch /tmp/q5_gates_done

step "exit_eps probe (VERDICT #7)"
timeout 1800 python -u experiments/probe_exit_eps.py > /tmp/q5_exit_eps.log 2>&1
tail -8 /tmp/q5_exit_eps.log >> "$LOG"

step "canonical 256^3 (2000-iter documented variant, VERDICT #3)"
ITERS=2000 OUT=/tmp/canonical_256_r5 timeout 14000 \
  bash experiments/run_canonical_256.sh >> /tmp/q5_canonical.log 2>&1
grep -i "psnr\|TIME CHECK\|stage" /tmp/canonical_256_r5.log 2>/dev/null | tail -20 >> "$LOG"
touch /tmp/q5_canonical_done

echo "=== chip_queue_r5 done $(date) ===" >> "$LOG"
touch /tmp/chip_queue_r5_done
