#!/bin/bash
# VERDICT round-2 item #4: the canonical 256^3 recipe end-to-end on the chip.
# Reference recipe of record: 4 stages to 256^3 at 400x400
# (/root/reference/thre3d_elements/relu_fields/train_sh_based_voxel_grid_with_posed_images.py:55,92-94
#  -- grid_dims 256, num_stages 4, num_iterations_per_stage 7000).
# ITERS defaults shorter for a step-time/HBM validation pass; pass ITERS=7000
# for the full reference-default run. Report per-stage steady-state step time,
# heldout PSNR and wall clock in README.
set -e
cd "$(dirname "$0")/.."
DS=${DS:-/tmp/canonical_ds400}
OUT=${OUT:-/tmp/canonical_256}
ITERS=${ITERS:-2000}
PROC=${PROC:-render_sh_voxel_grid_gnomonic}

if [ ! -d "$DS" ]; then
  python tools/make_synthetic_dataset.py -o "$DS" --image_size 400 \
    --grid_size 128 --gt_samples_per_ray 1024
fi

python apps/train_sh_voxel_grid.py -d "$DS" -o "$OUT" \
  --separate_train_test_folders True --data_downsample_factor 1.0 \
  --grid_dims 256 256 256 --num_stages 4 --num_iterations_per_stage "$ITERS" \
  --render_procedure "$PROC" \
  --save_frequency 1000 --test_frequency "$ITERS" --feedback_frequency 1000 \
  --summary_frequency 100 --fast_debug_mode False 2>&1 | tee "$OUT.log"
