"""Same pose: fused _render_image_jit vs the sum of its pieces."""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from make_synthetic_dataset import make_blob_scene
from thr3ed_atom_tpu.rendering.bricked import (
    _render_image_jit,
    _tile_image_rays,
    build_tables,
    compute_ray_features,
    dominant_axis_for_pose,
    prepare_bricked_grid,
    statics_for_grid,
)
from thr3ed_atom_tpu.ops.pallas.slab_march import slab_march_render
from thr3ed_atom_tpu.utils.camera import pose_spherical

GRID_SIZE = 128
IMAGE_SIZE = 400

grid = make_blob_scene(grid_size=GRID_SIZE, seed=3)
pose = pose_spherical(46.8, -47.2, 4.0)  # a median pose from the per-pose sweep
rotation = np.asarray(pose.rotation).reshape(3, 3)
axis, flip = dominant_axis_for_pose(rotation)
# bench-config statics: exit_eps=1e-4, occ 1e-4
statics = statics_for_grid(
    grid, axis, flip, exit_eps=1e-4, occupancy_alpha_thresh=1e-4,
    with_diffuse=False, tile_px=0, interpret=False,
)
tile_px = statics.tile_px
repacked, occ_dil = prepare_bricked_grid(grid, statics)
jax.block_until_ready(repacked)

h = w = IMAGE_SIZE
rot = jnp.asarray(rotation, jnp.float32)
tr = jnp.asarray(np.asarray(pose.translation), jnp.float32).reshape(3)


def sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf.astype(jnp.float32)))


def timeit(fn, *args, n=20):
    out = fn(*args)
    sync(out)
    for _ in range(5):
        out = fn(*args)
    sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / n, out


fused = lambda rot, tr: _render_image_jit(
    statics, h, w, w * 1.1, True, False, repacked, occ_dil, rot, tr
)
t_fused, out = timeit(fused, rot, tr)
print(f"fused _render_image_jit: {t_fused*1e3:.2f} ms")

hp = wp = -(-h // tile_px) * tile_px
pieces_rays = jax.jit(lambda rot, tr: _tile_image_rays(hp, wp, w * 1.1, h, w, rot, tr, tile_px))
t1, (rays_o, rays_d) = timeit(pieces_rays, rot, tr)
feat_fn = jax.jit(lambda o, d: compute_ray_features(o, d, statics))
t2, rays_feat = timeit(feat_fn, rays_o, rays_d)
tab_fn = jax.jit(lambda rf, occ: build_tables(rf, occ, statics))
t3, (tables, counts, ovf) = timeit(tab_fn, rays_feat, occ_dil)
march_fn = jax.jit(
    lambda tab, c, rf, rp: slab_march_render(
        tab, c, rf, rp, ncoeff=statics.ncoeff, relu_sigma=statics.relu_sigma,
        exit_eps=statics.exit_eps, with_diffuse=False, interpret=False,
    )
)
t4, _ = timeit(march_fn, tables, counts, rays_feat, repacked)
cts = np.asarray(counts)
print(f"pieces: rays {t1*1e3:.2f} + feat {t2*1e3:.2f} + tables {t3*1e3:.2f} "
      f"+ march {t4*1e3:.2f} = {(t1+t2+t3+t4)*1e3:.2f} ms")
print(f"counts mean={cts.mean():.1f} max={cts.max()} sum={cts.sum()}")

# fused minus the kernel: replace slab_march_render's cost by rendering with a
# count-zero table (early-out)  -> measures everything around the kernel
zero_counts = jnp.zeros_like(counts)
t5, _ = timeit(march_fn, tables, zero_counts, rays_feat, repacked)
print(f"march with zero counts (fixed overhead): {t5*1e3:.2f} ms")
