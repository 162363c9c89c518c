"""Per-pose component breakdown of the plane-march render path on the real chip.

Times each pipeline stage in isolation (rays+features, tables, kernel, and the
full jitted image) for a median orbit pose, plus entry statistics (active table
entries per pose) to convert kernel time into us/entry.

Run:  python experiments/profile_planes_pose.py [grid_size] [P]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from make_synthetic_dataset import make_blob_scene
from thr3ed_atom_tpu.rendering import planes as pp
from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose, _tile_image_rays
from thr3ed_atom_tpu.ops.pallas.plane_march import plane_march_render
from thr3ed_atom_tpu.utils.camera import CameraIntrinsics, pose_spherical

GRID_SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 128
P = int(sys.argv[2]) if len(sys.argv) > 2 else 1
IMAGE_SIZE = 400

grid = make_blob_scene(grid_size=GRID_SIZE, seed=3, converged=True)
intr = CameraIntrinsics(IMAGE_SIZE, IMAGE_SIZE, IMAGE_SIZE * 1.1)
pose = pose_spherical(123.0, -35.0, 4.0)
rotation = np.asarray(pose.rotation).reshape(3, 3)
axis, flip = dominant_axis_for_pose(rotation)
statics = pp.statics_for_grid(grid, axis, flip, pos_per_cell=P)
tile = statics.tile_px

repacked, occ_dil = pp.prepare_plane_grid(grid, statics)
repacked.block_until_ready()

H = W = IMAGE_SIZE
hp = -(-H // tile) * tile
wp = -(-W // tile) * tile
rot_j = jnp.asarray(rotation, jnp.float32)
tr_j = jnp.asarray(np.asarray(pose.translation), jnp.float32).reshape(3)


@jax.jit
def stage_rays(rot, tr):
    o, d = _tile_image_rays(hp, wp, intr.focal, H, W, rot, tr, tile)
    return pp.compute_ray_features(o, d, statics)


@jax.jit
def stage_tables(rays_feat, occ):
    return pp.build_tables(rays_feat, occ, statics)


rays_feat = stage_rays(rot_j, tr_j)
tables, counts, overflow = stage_tables(rays_feat, occ_dil)
print(
    f"axis={axis} flip={flip} tile={tile} P={P} groups={tables.shape[1]//pp._MAX_ACTIVE}"
    f" tiles={tables.shape[0]}"
)
print(
    f"active entries/pose: {int(jnp.sum(counts))}  "
    f"mean/tile {float(jnp.mean(counts)):.1f}  max/tile {int(jnp.max(counts))}  "
    f"overflow={bool(overflow)}"
)


def timeit(fn, n=30):
    fn()
    jax.block_until_ready(fn())
    # sync via scalar pull (block_until_ready unreliable through the tunnel)
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        _ = float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., :1]))
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


t_rays = timeit(lambda: stage_rays(rot_j, tr_j))
t_tables = timeit(lambda: stage_tables(rays_feat, occ_dil))

kern = jax.jit(
    lambda t, c, r, g: plane_march_render(
        t, c, r, g, ncoeff=statics.ncoeff, relu_sigma=statics.relu_sigma,
        exit_eps=statics.exit_eps,
    )
)
t_kernel = timeit(lambda: kern(tables, counts, rays_feat, repacked))

full = lambda: pp._render_image_jit(
    statics, H, W, intr.focal, True, False, repacked, occ_dil, rot_j, tr_j
)
t_full = timeit(full)

t_repack = timeit(lambda: pp.prepare_plane_grid(grid, statics), n=5)

n_entries = int(jnp.sum(counts))
print(f"rays+features: {t_rays:7.2f} ms")
print(f"tables:        {t_tables:7.2f} ms")
print(f"kernel:        {t_kernel:7.2f} ms  ({t_kernel * 1e3 / max(n_entries,1):.2f} us/entry)")
print(f"full image:    {t_full:7.2f} ms")
print(f"[repack+mip:   {t_repack:7.2f} ms  (cached across poses)]")
samples = n_entries * (pp.GS - 1) * (tile * tile)
print(f"shaded cell-samples/pose ~{samples/1e6:.1f} M -> kernel {samples/t_kernel/1e3:.2f} G samples/s")
