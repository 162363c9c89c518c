"""Break down the per-pose bricked render: ray features / table build / kernel.

Run on the real TPU to find where the 142 ms/pose goes.
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


def timeit(fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    # warm more
    for _ in range(3):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


def main():
    grid = make_blob_scene(grid_size=GRID_SIZE, seed=3)
    pose = pose_spherical(33.0, -40.0, 4.0)
    rotation = np.asarray(pose.rotation).reshape(3, 3)
    axis, flip = dominant_axis_for_pose(rotation)
    statics = statics_for_grid(
        grid, axis, flip, exit_eps=1e-3, occupancy_alpha_thresh=1e-4,
        with_diffuse=False, tile_px=0, interpret=False,
    )
    tile_px = statics.tile_px
    print("tile_px:", tile_px, "axis:", axis, "flip:", flip)

    repacked, occ_dil = prepare_bricked_grid(grid, statics)
    jax.block_until_ready(repacked)
    print("repacked:", repacked.shape, repacked.dtype, "occ:", occ_dil.shape)

    h = w = IMAGE_SIZE
    hp = -(-h // tile_px) * tile_px
    wp = -(-w // tile_px) * tile_px
    rot = jnp.asarray(rotation, jnp.float32)
    tr = jnp.asarray(np.asarray(pose.translation), jnp.float32).reshape(3)

    rays_fn = jax.jit(
        lambda rot, tr: _tile_image_rays(hp, wp, w * 1.1, h, w, rot, tr, tile_px)
    )
    t_rays, (rays_o, rays_d) = timeit(rays_fn, rot, tr)
    print(f"tile_image_rays: {t_rays*1e3:.2f} ms  tiles={rays_o.shape[0]}")

    feat_fn = jax.jit(lambda o, d: compute_ray_features(o, d, statics))
    t_feat, rays_feat = timeit(feat_fn, rays_o, rays_d)
    print(f"compute_ray_features: {t_feat*1e3:.2f} ms  {rays_feat.shape}")

    tab_fn = jax.jit(lambda rf, occ: build_tables(rf, occ, statics))
    t_tab, (tables, counts, ovf) = timeit(tab_fn, rays_feat, occ_dil)
    print(f"build_tables: {t_tab*1e3:.2f} ms  tables={tables.shape}")
    cts = np.asarray(counts)
    print(f"counts: mean={cts.mean():.1f} max={cts.max()} total={cts.sum()}")

    march_fn = jax.jit(
        lambda tab, c, rf, rp: slab_march_render(
            tab, c, rf, rp, ncoeff=statics.ncoeff, relu_sigma=statics.relu_sigma,
            exit_eps=statics.exit_eps, with_diffuse=False, interpret=False,
        )
    )
    t_march, out = timeit(march_fn, tables, counts, rays_feat, repacked)
    print(f"slab_march kernel: {t_march*1e3:.2f} ms")

    total = t_rays + t_feat + t_tab + t_march
    rays_total = h * w
    print(f"sum: {total*1e3:.2f} ms -> {rays_total/total/1e6:.2f} M rays/s")
    print(f"kernel-only rate: {rays_total/t_march/1e6:.2f} M rays/s")


if __name__ == "__main__":
    main()
