"""Tile-based training step driving the fused slab-march kernel.

The reference trainer optimizes on uniformly random rays across the whole ray pool
(reference thre3d_atom/modules/trainers.py:281-301). The slab-march kernel needs
pose-coherent 16x16-pixel tiles, so this step samples ONE training pose per
iteration (the host picks it, making the pose's march axis/flip a static of the
compiled step — at most 6 variants) and a random set of tiles at arbitrary pixel
offsets within that image. Single-image batches are the original-NeRF training
regime and converge equivalently for per-pixel L2/L1 objectives; heldout-PSNR
parity is validated by the training tests / PARITY_RUN.md.

Gradients flow loss -> kernel custom VJP -> repacked-grid cotangent -> (XLA
autodiff) slab lerp/pad/transpose/preactivation -> raw grid arrays. Stratified
sampling along the march axis comes from a per-step random slab offset theta
(see rendering.bricked.repack_slab_grid).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from thr3ed_atom_tpu.models.voxels import VoxelGrid
from thr3ed_atom_tpu.ops.pallas.slab_march import slab_march
from thr3ed_atom_tpu.rendering.bricked import (
    BrickedStatics,
    build_tables,
    compute_ray_features,
    occupancy_mip,
    repack_slab_grid,
    statics_for_grid,
)
from thr3ed_atom_tpu.utils.metrics import mse2psnr


class BrickedTrainStatics(NamedTuple):
    """Hashable statics selecting one compiled bricked train step."""

    bricked: BrickedStatics
    image_height: int
    image_width: int
    focal: float
    num_tiles: int  # tiles per batch (rays = num_tiles * tile_px^2)
    white_bkgd: bool
    apply_diffuse_render_regularization: bool


def make_bricked_train_statics(
    voxel_grid: VoxelGrid,
    axis: int,
    flip: bool,
    *,
    image_height: int,
    image_width: int,
    focal: float,
    ray_batch_size: int,
    white_bkgd: bool,
    apply_diffuse_render_regularization: bool = True,
    exit_eps: float = 1e-4,
    occupancy_alpha_thresh: float = 1e-4,
    tile_px: int = 0,
    interpret: bool = False,
) -> BrickedTrainStatics:
    bricked = statics_for_grid(
        voxel_grid,
        axis,
        flip,
        exit_eps=exit_eps,
        occupancy_alpha_thresh=occupancy_alpha_thresh,
        with_diffuse=apply_diffuse_render_regularization,
        tile_px=tile_px,
        interpret=interpret,
    )
    rays_per_tile = bricked.tile_px**2
    num_tiles = max(1, ray_batch_size // rays_per_tile)
    return BrickedTrainStatics(
        bricked=bricked,
        image_height=int(image_height),
        image_width=int(image_width),
        focal=float(focal),
        num_tiles=num_tiles,
        white_bkgd=bool(white_bkgd),
        apply_diffuse_render_regularization=bool(
            apply_diffuse_render_regularization
        ),
    )


def _sample_tiles(
    key: jax.Array,
    statics: BrickedTrainStatics,
    images: jnp.ndarray,  # [N, H, W, 3]
    poses: jnp.ndarray,  # [N, 3, 4]
    pose_idx: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random tiles at arbitrary pixel offsets of ONE image -> (rays_o, rays_d,
    gt pixels), each [NT, tile_px^2, ...]."""
    tp = statics.bricked.tile_px
    nt = statics.num_tiles
    height, width, focal = statics.image_height, statics.image_width, statics.focal

    key_y, key_x = jax.random.split(key)
    ty = jax.random.randint(key_y, (nt,), 0, height - tp + 1)
    tx = jax.random.randint(key_x, (nt,), 0, width - tp + 1)
    dy = jnp.arange(tp)
    py = (ty[:, None, None] + dy[None, :, None] + jnp.zeros((1, 1, tp), jnp.int32))
    px = (tx[:, None, None] + jnp.zeros((1, tp, 1), jnp.int32) + dy[None, None, :])

    pixels = images[pose_idx, py, px].reshape(nt, tp * tp, 3)

    xf = px.astype(jnp.float32) + 0.5
    yf = py.astype(jnp.float32) + 0.5
    dirs_cam = jnp.stack(
        [
            (xf - width * 0.5) / focal,
            -(yf - height * 0.5) / focal,
            -jnp.ones_like(xf),
        ],
        axis=-1,
    ).reshape(nt, tp * tp, 3)
    pose = poses[pose_idx]
    rays_d = jnp.einsum("ij,ntj->nti", pose[:, :3], dirs_cam)
    rays_o = jnp.broadcast_to(pose[:, 3][None, None, :], rays_d.shape)
    return rays_o, rays_d, pixels


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3))
def bricked_train_step(
    statics: BrickedTrainStatics,
    tx: optax.GradientTransformation,
    grid: VoxelGrid,
    opt_state,
    images: jnp.ndarray,
    poses: jnp.ndarray,
    pose_idx: jnp.ndarray,
    key: jax.Array,
):
    """One fused optimization step on tiles of a single pose."""
    bst = statics.bricked
    key_tiles, key_theta = jax.random.split(key)
    rays_o, rays_d, pixels = _sample_tiles(key_tiles, statics, images, poses, pose_idx)
    theta = jax.random.uniform(key_theta, (), minval=0.05, maxval=0.95)

    rays_feat = compute_ray_features(rays_o, rays_d, bst, theta)
    # tables are integer sampling geometry: no gradient flows through them, and the
    # occupancy mip must not differentiate the grid
    occ = occupancy_mip(jax.tree_util.tree_map(jax.lax.stop_gradient, grid), bst)
    tables, counts, _overflow = build_tables(rays_feat, occ, bst)

    def loss_fn(g: VoxelGrid):
        repacked = repack_slab_grid(g, bst, theta)
        out = slab_march(
            tables,
            counts,
            rays_feat,
            repacked,
            ncoeff=bst.ncoeff,
            relu_sigma=bst.relu_sigma,
            exit_eps=bst.exit_eps,
            with_diffuse=bst.with_diffuse,
            interpret=bst.interpret,
        )
        colour = out[..., 0:3]
        acc = out[..., 3:4]
        if statics.white_bkgd:
            colour = colour + (1.0 - acc)
        specular_loss = jnp.mean(jnp.abs(colour - pixels))
        specular_mse = jnp.mean((colour - pixels) ** 2)
        total = specular_loss
        aux = {
            "specular_loss": specular_loss,
            "specular_psnr": mse2psnr(specular_mse),
        }
        if statics.apply_diffuse_render_regularization:
            diffuse = out[..., 5:8]
            if statics.white_bkgd:
                diffuse = diffuse + (1.0 - acc)
            diffuse_loss = jnp.mean(jnp.abs(diffuse - pixels))
            diffuse_mse = jnp.mean((diffuse - pixels) ** 2)
            total = total + diffuse_loss
            aux |= {
                "diffuse_loss": diffuse_loss,
                "diffuse_psnr": mse2psnr(diffuse_mse),
            }
        aux["total_loss"] = total
        return total, aux

    (_loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(grid)
    updates, opt_state = tx.update(grads, opt_state, grid)
    grid = optax.apply_updates(grid, updates)
    return grid, opt_state, metrics
