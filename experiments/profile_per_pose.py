"""Per-pose render time vs march variant / elevation / table workload."""
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
meta = [(rng.uniform(0, 360), rng.uniform(-90, 0)) for _ in range(100)]
poses = [pose_spherical(a, e, 4.0) for a, e in meta]

for pose in poses[:12]:
    out = vol_mod.render(pose, intrinsics)
float(jnp.sum(out.colour))
# extra warm pass over everything once
for pose in poses:
    out = vol_mod.render(pose, intrinsics)
float(jnp.sum(out.colour))

rows = []
for (a, e), pose in zip(meta, poses):
    v = dominant_axis_for_pose(np.asarray(pose.rotation).reshape(3, 3))
    t0 = time.perf_counter()
    out = vol_mod.render(pose, intrinsics)
    float(jnp.sum(out.colour))
    dt = (time.perf_counter() - t0) * 1e3
    rows.append((dt, v, e, a))

rows.sort()
print("fastest 10:")
for dt, v, e, a in rows[:10]:
    print(f"  {dt:7.1f} ms  variant={v}  elev={e:6.1f} azim={a:6.1f}")
print("slowest 10:")
for dt, v, e, a in rows[-10:]:
    print(f"  {dt:7.1f} ms  variant={v}  elev={e:6.1f} azim={a:6.1f}")
arr = np.array([r[0] for r in rows])
print(f"mean {arr.mean():.1f} ms  median {np.median(arr):.1f}  p90 {np.percentile(arr,90):.1f}")
by_v = {}
for dt, v, e, a in rows:
    by_v.setdefault(v, []).append(dt)
for v, ts in sorted(by_v.items()):
    print(f"variant {v}: n={len(ts)} mean={np.mean(ts):.1f} ms")
