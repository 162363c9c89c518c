"""Why is vol_mod.render ~142 ms/pose when its pieces sum to ~26 ms?"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from make_synthetic_dataset import make_blob_scene
from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
from thr3ed_atom_tpu.utils.camera import CameraBounds, CameraIntrinsics, pose_spherical

GRID_SIZE = 128
IMAGE_SIZE = 400

grid = make_blob_scene(grid_size=GRID_SIZE, seed=3)
config = SHVoxGridRenderConfig(
    num_samples_per_ray=256,
    camera_bounds=CameraBounds(2.0, 6.0),
    perturb_sampled_points=False,
    white_bkgd=True,
)
print("exit_eps:", config.bricked_exit_eps, "occ:", config.bricked_occupancy_alpha_thresh,
      "tile_px:", config.bricked_tile_px)
vol_mod = VolumetricModel(
    grid, render_procedure="render_sh_voxel_grid_bricked", render_config=config
)
intrinsics = CameraIntrinsics(IMAGE_SIZE, IMAGE_SIZE, IMAGE_SIZE * 1.1)

rng = np.random.default_rng(42)
poses = [
    pose_spherical(rng.uniform(0, 360), rng.uniform(-90, 0), 4.0) for _ in range(100)
]

# warm all variants
for pose in poses[:12]:
    out = vol_mod.render(pose, intrinsics)
float(jnp.sum(out.colour))

# per-pose timing WITH sync each call
for pose in poses[:3]:
    t0 = time.perf_counter()
    out = vol_mod.render(pose, intrinsics)
    t_dispatch = time.perf_counter() - t0
    float(jnp.sum(out.colour))
    t_total = time.perf_counter() - t0
    print(f"dispatch={t_dispatch*1e3:7.2f} ms  total={t_total*1e3:7.2f} ms")

# pipelined over 30 poses
t0 = time.perf_counter()
for pose in poses[:30]:
    out = vol_mod.render(pose, intrinsics)
float(jnp.sum(out.colour))
dt = (time.perf_counter() - t0) / 30
print(f"pipelined: {dt*1e3:.2f} ms/pose -> {IMAGE_SIZE*IMAGE_SIZE/dt/1e6:.2f} M rays/s")

# same pose repeatedly (no new variants, same arrays)
t0 = time.perf_counter()
for _ in range(30):
    out = vol_mod.render(poses[0], intrinsics)
float(jnp.sum(out.colour))
dt = (time.perf_counter() - t0) / 30
print(f"same-pose: {dt*1e3:.2f} ms/pose -> {IMAGE_SIZE*IMAGE_SIZE/dt/1e6:.2f} M rays/s")
