"""Pipelined render throughput: bench pose order vs variant-sorted order."""
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
from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose
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
vol_mod = VolumetricModel(
    grid, render_procedure="render_sh_voxel_grid_bricked", render_config=config
)
intrinsics = CameraIntrinsics(IMAGE_SIZE, IMAGE_SIZE, IMAGE_SIZE * 1.1)

rng = np.random.default_rng(42)
poses = [pose_spherical(rng.uniform(0, 360), rng.uniform(-90, 0), 4.0) for _ in range(100)]
variant = lambda p: dominant_axis_for_pose(np.asarray(p.rotation).reshape(3, 3))

for pose in poses[:12]:
    out = vol_mod.render(pose, intrinsics)
float(jnp.sum(out.colour))
for pose in poses:
    out = vol_mod.render(pose, intrinsics)
float(jnp.sum(out.colour))


def run(seq, label):
    t0 = time.perf_counter()
    for p in seq:
        out = vol_mod.render(p, intrinsics)
    float(jnp.sum(out.colour))
    dt = (time.perf_counter() - t0) / len(seq)
    print(f"{label}: {dt*1e3:7.2f} ms/pose  {IMAGE_SIZE*IMAGE_SIZE/dt/1e6:5.2f} M rays/s")


run(poses, "bench order (mixed variants)")
run(sorted(poses, key=variant), "sorted by variant")
run(poses, "bench order again")
one = [p for p in poses if variant(p) == (2, True)]
run((one * 3)[:100], "single variant only")
# sync every K poses instead of fully pipelined
for k in (4, 16):
    t0 = time.perf_counter()
    for i, p in enumerate(poses):
        out = vol_mod.render(p, intrinsics)
        if (i + 1) % k == 0:
            float(jnp.sum(out.colour))
    float(jnp.sum(out.colour))
    dt = (time.perf_counter() - t0) / len(poses)
    print(f"sync every {k:2d}: {dt*1e3:7.2f} ms/pose  {IMAGE_SIZE*IMAGE_SIZE/dt/1e6:5.2f} M rays/s")
