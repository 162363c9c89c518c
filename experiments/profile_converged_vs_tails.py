"""Why is the converged-density scene slower to render than the tails scene?"""
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


def sync(x):
    float(jnp.sum(jax.tree_util.tree_leaves(x)[0].astype(jnp.float32)))


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


pose = pose_spherical(46.8, -47.2, 4.0)
rotation = np.asarray(pose.rotation).reshape(3, 3)
axis, flip = dominant_axis_for_pose(rotation)

for converged in (False, True):
    grid = make_blob_scene(grid_size=GRID_SIZE, seed=3, converged=converged)
    statics = statics_for_grid(
        grid, axis, flip, exit_eps=1e-4, occupancy_alpha_thresh=1e-4,
        with_diffuse=False, tile_px=0, interpret=False,
    )
    tile_px = statics.tile_px
    repacked, occ_dil = prepare_bricked_grid(grid, statics)
    sync(repacked)
    h = w = IMAGE_SIZE
    hp = wp = -(-h // tile_px) * tile_px
    rot = jnp.asarray(rotation, jnp.float32)
    tr = jnp.asarray(np.asarray(pose.translation), jnp.float32).reshape(3)
    rays_o, rays_d = jax.jit(
        lambda rot, tr: _tile_image_rays(hp, wp, w * 1.1, h, w, rot, tr, tile_px)
    )(rot, tr)
    rays_feat = jax.jit(lambda o, d: compute_ray_features(o, d, statics))(rays_o, rays_d)
    tables, counts, _ = jax.jit(lambda rf, occ: build_tables(rf, occ, statics))(
        rays_feat, occ_dil
    )
    cts = np.asarray(counts)
    march_fn = jax.jit(
        lambda tab, c, rf, rp: slab_march_render(
            tab, c, rf, rp, ncoeff=statics.ncoeff, relu_sigma=statics.relu_sigma,
            exit_eps=statics.exit_eps, with_diffuse=False, interpret=False,
        )
    )
    t_march, out = timeit(march_fn, tables, counts, rays_feat, repacked)
    print(
        f"converged={converged}: counts mean={cts.mean():.1f} max={cts.max()} "
        f"sum={cts.sum()}  march={t_march*1e3:.2f} ms"
    )
