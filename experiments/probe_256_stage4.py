"""Reproduce the canonical-256 stage-4 stall: load the stage-3 (128^3)
checkpoint, grow to 256^3, and time each piece of the gnomonic whole-pose
pipeline (feedback render, then a train step) with hard progress prints.

Usage: timeout 1800 python experiments/probe_256_stage4.py [ckpt]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

CKPT = sys.argv[1] if len(sys.argv) > 1 else (
    "/tmp/canonical_256/saved_models/model_stage_3_iter_3000.npz")


def t(msg, start):
    print(f"[{time.time() - start:8.1f}s] {msg}", flush=True)


def main():
    start = time.time()
    t("importing framework", start)
    from thr3ed_atom_tpu.data.dataset import PosedImagesDataset
    from thr3ed_atom_tpu.models.voxels import (
        scale_voxel_grid_with_required_output_size,
    )
    from thr3ed_atom_tpu.modules.volumetric_model import (
        create_volumetric_model_from_saved_model,
    )

    t("loading checkpoint " + CKPT, start)
    vol_mod, _ = create_volumetric_model_from_saved_model(CKPT)
    grid = vol_mod.thre3d_repr
    t(f"grid dims {grid.densities.shape}  procedure "
      f"{vol_mod.render_procedure_name}", start)

    t("growing to 256^3", start)
    grid = scale_voxel_grid_with_required_output_size(grid, (256, 256, 256))
    grid = jax.block_until_ready(grid)
    vol_mod.thre3d_repr = grid
    t(f"grown: {grid.densities.shape}", start)

    ds = PosedImagesDataset(
        "/tmp/canonical_ds400/train",
        "/tmp/canonical_ds400/train_camera_params.json",
    )
    intr = ds.camera_intrinsics
    pose = ds.extract_pose(next(iter(ds._camera_parameters.values())))
    t(f"dataset {intr.height}x{intr.width} focal {intr.focal:.1f}", start)

    t("feedback render compile+run #1 (whole pose @ 256^3) ...", start)
    out = vol_mod.render(pose, intr)
    out = jax.block_until_ready(out.colour)
    t("render #1 done", start)
    r0 = time.time()
    out = jax.block_until_ready(vol_mod.render(pose, intr).colour)
    t(f"render #2 done: {(time.time() - r0) * 1e3:.1f} ms", start)

    # ---- the train step at 256^3 (the suspected stall)
    import optax

    from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose
    from thr3ed_atom_tpu.rendering.gnomonic_train import (
        gnomonic_train_step,
        make_gnomonic_train_statics,
    )
    from thr3ed_atom_tpu.rendering.warp_matmul import warp_swap_for_pose

    axis, flip = dominant_axis_for_pose(pose.rotation)
    t(f"building train statics (axis={axis} flip={flip})", start)
    tstat = make_gnomonic_train_statics(
        grid, axis, flip,
        image_height=intr.height, image_width=intr.width,
        white_bkgd=True, qb=128,
        warp_swap=warp_swap_for_pose(
            pose.rotation, axis, flip, intr.height, intr.width,
            float(intr.focal),
        ),
    )
    t(f"tstat frame={tstat.frame} P={tstat.statics.pos_per_cell} "
      f"ss={tstat.supersample}", start)
    tx = optax.adam(0.03)
    opt_state = tx.init(grid)
    img = jax.numpy.asarray(ds[0][0] if isinstance(ds[0], tuple) else ds[0])
    t(f"image {img.shape}; train step compile+run #1 ...", start)
    g2, opt2, metrics = gnomonic_train_step(
        tstat, tx, grid, opt_state, img,
        jax.numpy.asarray(pose.rotation), jax.numpy.asarray(pose.translation),
        jax.numpy.asarray(float(intr.focal)),
    )
    jax.block_until_ready(g2.densities)
    t(f"train step #1 done: {metrics['total_loss']:.4f}", start)
    r0 = time.time()
    g3, opt3, metrics = gnomonic_train_step(
        tstat, tx, g2, opt2, img,
        jax.numpy.asarray(pose.rotation), jax.numpy.asarray(pose.translation),
        jax.numpy.asarray(float(intr.focal)),
    )
    jax.block_until_ready(g3.densities)
    dt = time.time() - r0
    t(f"train step #2 done: {dt * 1e3:.1f} ms "
      f"({intr.height * intr.width / dt / 1e6:.2f} M rays/s)", start)


if __name__ == "__main__":
    main()
