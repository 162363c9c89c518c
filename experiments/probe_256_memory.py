"""XLA memory analysis of the 256^3 gnomonic train step (the stage-4 OOM).

Prints argument/output/temp/peak sizes from compiled.memory_analysis() for
the production step program, so memory fixes target the real residents.

Usage: timeout 900 python experiments/probe_256_memory.py
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from thr3ed_atom_tpu.models.voxels import VoxelGrid
from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose
from thr3ed_atom_tpu.rendering.gnomonic_train import (
    gnomonic_train_step,
    make_gnomonic_train_statics,
)
from thr3ed_atom_tpu.rendering.warp_matmul import warp_swap_for_pose
from thr3ed_atom_tpu.utils.camera import pose_spherical


def main():
    n = 256
    from thr3ed_atom_tpu.models.voxels import VoxelSize

    grid = VoxelGrid(
        densities=jnp.zeros((n, n, n, 1), jnp.float32),
        features=jnp.zeros((n, n, n, 27), jnp.float32),
        voxel_size=VoxelSize(3.0 / n, 3.0 / n, 3.0 / n),
        density_postactivation="relu",
    )
    pose = pose_spherical(46.8, -47.2, 4.0)
    H = W = 400
    focal = 440.0
    axis, flip = dominant_axis_for_pose(pose.rotation)
    tstat = make_gnomonic_train_statics(
        grid, axis, flip, image_height=H, image_width=W, white_bkgd=True,
        qb=128,
        warp_swap=warp_swap_for_pose(
            pose.rotation, axis, flip, H, W, focal
        ),
    )
    tx = optax.adam(0.03)
    opt_state = tx.init(grid)
    img = jnp.zeros((H, W, 3), jnp.float32)

    lowered = gnomonic_train_step.lower(
        tstat, tx, grid, opt_state, img,
        jnp.asarray(pose.rotation), jnp.asarray(pose.translation),
        jnp.asarray(focal),
    )
    compiled = lowered.compile()
    ma = compiled.memory_analysis()
    gib = 1024 ** 3
    print(f"argument_size : {ma.argument_size_in_bytes / gib:.2f} GiB")
    print(f"output_size   : {ma.output_size_in_bytes / gib:.2f} GiB")
    print(f"alias_size    : {ma.alias_size_in_bytes / gib:.2f} GiB")
    print(f"temp_size     : {ma.temp_size_in_bytes / gib:.2f} GiB")
    print(f"peak (arg+out+temp-alias): "
          f"{(ma.argument_size_in_bytes + ma.output_size_in_bytes + ma.temp_size_in_bytes - ma.alias_size_in_bytes) / gib:.2f} GiB")


if __name__ == "__main__":
    main()
