"""Break down the bricked train step: repack / occupancy / tables / fwd / bwd / opt."""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import optax

from make_synthetic_dataset import make_blob_scene
from thr3ed_atom_tpu.modules.bricked_trainer import (
    _sample_tiles,
    bricked_train_step,
    make_bricked_train_statics,
)
from thr3ed_atom_tpu.rendering.bricked import (
    build_tables,
    compute_ray_features,
    dominant_axis_for_pose,
    occupancy_mip,
    repack_slab_grid,
)
from thr3ed_atom_tpu.ops.pallas.slab_march import slab_march
from thr3ed_atom_tpu.utils.camera import pose_spherical

GRID_SIZE = 128
IMAGE_SIZE = 400
RAY_BATCH = 32768

scene = make_blob_scene(grid_size=GRID_SIZE, seed=3)
rng = np.random.default_rng(0)
poses_np = np.stack(
    [np.hstack([p.rotation, p.translation]) for p in [pose_spherical(46.8, -47.2, 4.0)]]
).astype(np.float32)
images = jnp.asarray(rng.random((1, IMAGE_SIZE, IMAGE_SIZE, 3), dtype=np.float32))
poses = jnp.asarray(poses_np)
axis, flip = dominant_axis_for_pose(poses_np[0][:, :3])
statics = make_bricked_train_statics(
    scene, axis, flip, image_height=IMAGE_SIZE, image_width=IMAGE_SIZE,
    focal=IMAGE_SIZE * 1.1, ray_batch_size=RAY_BATCH, white_bkgd=True,
)
bst = statics.bricked
print("num_tiles:", statics.num_tiles, "tile_px:", bst.tile_px)


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


key = jax.random.PRNGKey(0)
theta = jnp.float32(0.5)

t_rep, repacked = timeit(jax.jit(lambda g, th: repack_slab_grid(g, bst, th)), scene, theta)
print(f"repack_slab_grid fwd: {t_rep*1e3:.2f} ms  {repacked.shape} {repacked.dtype}")

t_occ, occ = timeit(jax.jit(lambda g: occupancy_mip(g, bst)), scene)
print(f"occupancy_mip: {t_occ*1e3:.2f} ms")

samp = jax.jit(lambda k: _sample_tiles(k, statics, images, poses, jnp.int32(0)))
t_s, (rays_o, rays_d, pixels) = timeit(samp, key)
print(f"sample_tiles: {t_s*1e3:.2f} ms")

t_f, rays_feat = timeit(jax.jit(lambda o, d, th: compute_ray_features(o, d, bst, th)),
                        rays_o, rays_d, theta)
print(f"compute_ray_features: {t_f*1e3:.2f} ms")

t_t, (tables, counts, _) = timeit(jax.jit(lambda rf, oc: build_tables(rf, oc, bst)),
                                  rays_feat, occ)
print(f"build_tables: {t_t*1e3:.2f} ms  counts mean={np.asarray(counts).mean():.1f}")

march = lambda tab, c, rf, rp: slab_march(
    tab, c, rf, rp, ncoeff=bst.ncoeff, relu_sigma=bst.relu_sigma,
    exit_eps=bst.exit_eps, with_diffuse=bst.with_diffuse, interpret=False,
)
t_fw, out = timeit(jax.jit(march), tables, counts, rays_feat, repacked)
print(f"slab_march fwd: {t_fw*1e3:.2f} ms")

# fwd+bwd wrt repacked only (isolates kernels from repack VJP)
def loss_repacked(rp):
    o = march(tables, counts, rays_feat, rp)
    return jnp.sum(jnp.abs(o[..., 0:3] - pixels))

t_fb, _ = timeit(jax.jit(jax.grad(loss_repacked)), repacked)
print(f"fwd+bwd kernels (wrt repacked): {t_fb*1e3:.2f} ms")

# full grad wrt grid (adds repack VJP)
def loss_grid(g):
    rp = repack_slab_grid(g, bst, theta)
    o = march(tables, counts, rays_feat, rp)
    return jnp.sum(jnp.abs(o[..., 0:3] - pixels))

t_gg, _ = timeit(jax.jit(jax.grad(loss_grid)), scene)
print(f"full grad wrt grid (repack fwd+VJP + kernels): {t_gg*1e3:.2f} ms")

# whole production step
tx = optax.adam(0.03)
opt_state = tx.init(scene)


def full(g, os, k):
    return bricked_train_step(statics, tx, g, os, images, poses, jnp.int32(0), k)

# don't donate in the timing loop: reuse same inputs
t_all, _ = timeit(lambda k: bricked_train_step(
    statics, tx, jax.tree_util.tree_map(jnp.copy, scene), tx.init(scene), images,
    poses, jnp.int32(0), k), key, n=10)
print(f"full bricked_train_step (incl copies): {t_all*1e3:.2f} ms")
