"""Isolate the 200 ms/pose cost of varying poses in the bricked render."""
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
all_poses = [
    pose_spherical(rng.uniform(0, 360), rng.uniform(-90, 0), 4.0) for _ in range(100)
]
by_variant = {}
for p in all_poses:
    v = dominant_axis_for_pose(np.asarray(p.rotation).reshape(3, 3))
    by_variant.setdefault(v, []).append(p)
print({k: len(v) for k, v in by_variant.items()})

for pose in all_poses[:12]:
    out = vol_mod.render(pose, intrinsics)
float(jnp.sum(out.colour))


def rate(poses, label, n=24):
    # warm
    for p in poses[:4]:
        out = vol_mod.render(p, intrinsics)
    float(jnp.sum(out.colour))
    seq = [poses[i % len(poses)] for i in range(n)]
    t0 = time.perf_counter()
    for p in seq:
        out = vol_mod.render(p, intrinsics)
    float(jnp.sum(out.colour))
    dt = (time.perf_counter() - t0) / n
    print(f"{label}: {dt*1e3:7.2f} ms/pose  {IMAGE_SIZE*IMAGE_SIZE/dt/1e6:5.2f} M rays/s")


# 1) distinct poses, ONE variant
biggest = max(by_variant.values(), key=len)
rate(biggest[:20], "distinct poses, same variant")

# 2) same pose, but freshly-created pose object each time (new host arrays)
p0 = biggest[0]
import copy
clones = [copy.deepcopy(p0) for _ in range(20)]
rate(clones, "same pose values, fresh arrays")

# 3) two poses alternating across DIFFERENT variants
variants = list(by_variant.values())
if len(variants) >= 2:
    pair = [variants[0][0], variants[1][0]]
    rate(pair, "two poses, alternating variants")

# 4) per-pose timing distribution across distinct poses (sync each)
times = []
for p in biggest[:15]:
    t0 = time.perf_counter()
    out = vol_mod.render(p, intrinsics)
    float(jnp.sum(out.colour))
    times.append((time.perf_counter() - t0) * 1e3)
print("per-pose ms (same variant):", " ".join(f"{t:.0f}" for t in times))
