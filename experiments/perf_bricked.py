"""Measure the bricked slab-march renderer on the real TPU at bench shapes:
128^3 grid, 400x400 image, sparse blob scene (the bench.py harness scene).

Also cross-checks the image against the two-phase fast renderer (different sample
positions -> compare loosely via PSNR between the two renders).
"""
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

GRID_SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 128
IMAGE_SIZE = 400

print("devices:", jax.devices())
grid = make_blob_scene(grid_size=GRID_SIZE, seed=3)
config = SHVoxGridRenderConfig(
    num_samples_per_ray=256,
    camera_bounds=CameraBounds(2.0, 6.0),
    perturb_sampled_points=False,
    optimized_sampling=True,
    white_bkgd=True,
    fast_topk=32,
    fast_bf16_features=True,
)
intr = CameraIntrinsics(IMAGE_SIZE, IMAGE_SIZE, IMAGE_SIZE * 1.1)
rng = np.random.default_rng(42)
poses = [pose_spherical(rng.uniform(0, 360), rng.uniform(-90, 0), 4.0) for _ in range(12)]

vm_bricked = VolumetricModel(grid, "render_sh_voxel_grid_bricked", config)
vm_fast = VolumetricModel(grid, "render_sh_voxel_grid_fast", config)


def sync(out):
    return float(jnp.sum(out.colour))


def time_render(vm, pose):
    t0 = time.perf_counter()
    out = vm.render(pose, intr)
    sync(out)
    return time.perf_counter() - t0, out


# correctness cross-check on pose 0
_, out_b = time_render(vm_bricked, poses[0])
_, out_f = time_render(vm_fast, poses[0])
mse = float(jnp.mean((out_b.colour - out_f.colour) ** 2))
psnr = -10.0 * np.log10(max(mse, 1e-12))
print(f"bricked-vs-fast colour PSNR (different sample positions): {psnr:.1f} dB")
print("acc range bricked:", float(jnp.min(out_b.extra['accumulated_weight'])),
      float(jnp.max(out_b.extra['accumulated_weight'])))

# warm both paths until stable. The bricked path compiles one program per
# (march axis, flip) variant — warm EVERY pose once (6 compiles max), then warm
# pose 0 until per-call timing stabilizes (deferred AOT).
for name, vm in (("bricked", vm_bricked), ("fast", vm_fast)):
    for p in poses:
        time_render(vm, p)
    times = [time_render(vm, poses[0])[0] for _ in range(5)]
    for _ in range(20):
        if max(times[-3:]) < 1.2 * min(times[-3:]):
            break
        times.append(time_render(vm, poses[0])[0])
    per_pose = []
    t0 = time.perf_counter()
    for p in poses[2:]:
        per_pose.append(time_render(vm, p)[0])
    dt = time.perf_counter() - t0
    rays = (len(poses) - 2) * IMAGE_SIZE * IMAGE_SIZE
    print(
        f"{name}: {dt / (len(poses) - 2) * 1e3:.1f} ms/pose  "
        f"{rays / dt / 1e6:.2f} M rays/s   per-pose ms: "
        + " ".join(f"{t * 1e3:.0f}" for t in per_pose)
    )
