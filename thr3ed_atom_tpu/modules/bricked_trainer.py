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
from thr3ed_atom_tpu.ops.pallas.slab_march import (
    GS,
    L_AT,
    L_AU,
    L_AV,
    L_BT,
    L_BU,
    L_BV,
    L_DELTA,
    L_JMAX,
    L_JMIN,
    slab_march,
)
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
    # TRAINING defaults occupancy skipping OFF: a skipped (tile, slab-group)
    # receives zero gradient, so "empty" would be an absorbing state — a region
    # that transiently dips below the threshold could never regrow density.
    # Inference rendering keeps the threshold (the scene is fixed there).
    occupancy_alpha_thresh: float = 0.0,
    tile_px: int = 0,
    interpret: bool = False,
    axis_supersample: int = 0,  # 0 = auto (constant world quadrature)
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
        axis_supersample=axis_supersample,
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
    pose_idx: jnp.ndarray,  # [] or [NT] image index per tile
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Random tiles at arbitrary pixel offsets -> (rays_o, rays_d, gt pixels),
    each [NT, tile_px^2, ...].

    ``pose_idx`` may be per-tile: the slab repack depends only on the march
    (axis, flip) variant — NOT the pose — so one step can mix tiles from every
    training view that shares the variant, restoring the multi-view gradient
    diversity view-dependent SH terms need."""
    tp = statics.bricked.tile_px
    nt = statics.num_tiles
    height, width, focal = statics.image_height, statics.image_width, statics.focal
    pose_idx = jnp.broadcast_to(jnp.asarray(pose_idx, jnp.int32), (nt,))

    key_y, key_x = jax.random.split(key)
    ty = jax.random.randint(key_y, (nt,), 0, height - tp + 1)
    tx = jax.random.randint(key_x, (nt,), 0, width - tp + 1)
    dy = jnp.arange(tp)
    py = (ty[:, None, None] + dy[None, :, None] + jnp.zeros((1, 1, tp), jnp.int32))
    px = (tx[:, None, None] + jnp.zeros((1, tp, 1), jnp.int32) + dy[None, None, :])

    pixels = images[pose_idx[:, None, None], py, px].reshape(nt, tp * tp, 3)

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
    pose = poses[pose_idx]  # [NT, 3, 4]
    rays_d = jnp.einsum("nij,ntj->nti", pose[:, :, :3], dirs_cam,
                        precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(pose[:, None, :, 3], rays_d.shape)
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


# ------------------------------------------------------------------ multi-chip step
#
# Sharding layout (TPU-native, ICI collectives only):
#   "data"  axis: tiles (rays are embarrassingly parallel)
#   "model" axis: DEPTH SEGMENTS of the march — sample parallelism. Front-to-back
#     compositing is associative, (C1, T1) o (C2, T2) = (C1 + T1*C2, T1*T2), and the
#     kernel's acc output already encodes T = 1 - acc, so each device renders its
#     contiguous slab-group range against every local tile and the segments combine
#     with one all_gather over "model". Gradients psum over both axes.


def _combine_segments(gathered: jnp.ndarray) -> jnp.ndarray:
    """[n_seg, T, R, 8] per-segment composites (front-to-back order) -> [T, R, 8]."""
    out = gathered[0]
    for s in range(1, gathered.shape[0]):
        t_front = 1.0 - out[..., 3:4]
        out = jnp.concatenate(
            [
                out[..., 0:3] + t_front * gathered[s][..., 0:3],
                out[..., 3:4] + t_front * gathered[s][..., 3:4],
                out[..., 4:5] + t_front * gathered[s][..., 4:5],
                out[..., 5:8] + t_front * gathered[s][..., 5:8],
            ],
            axis=-1,
        )
    return out


@partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(3, 4))
def bricked_train_step_mesh(
    statics: BrickedTrainStatics,
    tx: optax.GradientTransformation,
    mesh_shape: Tuple[int, int],  # (data_parallel, model_parallel)
    grid: VoxelGrid,
    opt_state,
    images: jnp.ndarray,
    poses: jnp.ndarray,
    pose_idx: jnp.ndarray,
    key: jax.Array,
):
    """bricked_train_step over a ("data" tiles x "model" depth-segments) mesh."""
    import numpy as _np
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    data_parallel, model_parallel = mesh_shape
    n_dev = data_parallel * model_parallel
    mesh = Mesh(
        _np.array(jax.devices()[:n_dev]).reshape(data_parallel, model_parallel),
        axis_names=("data", "model"),
    )
    bst = statics.bricked
    (_u_ax, _v_ax, _ns, num_groups, _ur, _vr, _up, _vp, _sc) = _slab_geom(bst)
    assert num_groups % model_parallel == 0, (
        f"slab groups ({num_groups}) must divide over model_parallel "
        f"({model_parallel})"
    )
    seg_groups = num_groups // model_parallel
    assert statics.num_tiles % data_parallel == 0

    key_tiles, key_theta = jax.random.split(key)
    rays_o, rays_d, pixels = _sample_tiles(key_tiles, statics, images, poses, pose_idx)
    theta = jax.random.uniform(key_theta, (), minval=0.05, maxval=0.95)
    rays_feat = compute_ray_features(rays_o, rays_d, bst, theta)

    n_total = float(statics.num_tiles * bst.tile_px**2 * 3)

    def device_fn(grid_rep, rays_feat_l, pixels_l, theta_l):
        seg = jax.lax.axis_index("model")
        # rays stay in GLOBAL slab coordinates (bit-identical tent weights across
        # segmentings); tables carry global group indices restricted to this
        # segment and the kernel rebases DMA indices by group_offset
        seg_g0 = seg * seg_groups

        def loss_fn(g):
            repacked = repack_slab_grid(g, bst, theta_l)
            local_grid = jax.lax.dynamic_slice_in_dim(
                repacked, seg_g0, seg_groups, axis=0
            )
            occ_full = occupancy_mip(
                jax.tree_util.tree_map(jax.lax.stop_gradient, g), bst
            )
            occ_local = jax.lax.dynamic_slice_in_dim(
                occ_full, seg_g0, seg_groups, axis=0
            )
            tables, counts, _ovf = build_tables(
                rays_feat_l, occ_local, bst, group_range=(seg_g0, seg_g0 + seg_groups)
            )
            out_local = slab_march(
                tables, counts, rays_feat_l, local_grid,
                ncoeff=bst.ncoeff, relu_sigma=bst.relu_sigma,
                # segment-LOCAL early exit (round-5): a segment cannot see the
                # transmittance accumulated upstream, but exiting when its OWN
                # local transmittance drops below eps is conservative-correct:
                # total T = T_upstream * T_local <= T_local, so the truncated
                # tail's contribution is bounded by eps exactly like the
                # single-device rule. Measured single-chip cost of exit_eps=0
                # (what this used to hard-code): +16-19% step time
                # (experiments/probe_exit_eps_cost.py). Tests that assert
                # exact sharded==unsharded parity pass exit_eps=0 explicitly.
                exit_eps=bst.exit_eps,
                with_diffuse=bst.with_diffuse, group_offset=seg_g0,
                interpret=bst.interpret,
            )
            gathered = jax.lax.all_gather(out_local, "model")  # [n_seg, T_l, R, 8]
            out = _combine_segments(gathered)
            colour = out[..., 0:3]
            acc = out[..., 3:4]
            if statics.white_bkgd:
                colour = colour + (1.0 - acc)
            err_sum = jnp.sum(jnp.abs(colour - pixels_l))
            sq_sum = jnp.sum((colour - pixels_l) ** 2)
            total = err_sum / n_total
            if statics.apply_diffuse_render_regularization:
                diffuse = out[..., 5:8]
                if statics.white_bkgd:
                    diffuse = diffuse + (1.0 - acc)
                total = total + jnp.sum(jnp.abs(diffuse - pixels_l)) / n_total
            return total, sq_sum

        (loss_l, sq_l), grads_l = jax.value_and_grad(loss_fn, has_aux=True)(grid_rep)
        # every "model" rank replicates the combined loss, so the all_gather
        # transpose (psum_scatter) sums model_parallel identical cotangents into
        # each segment: grads_l carries an extra factor of model_parallel. The
        # "model" psum assembles the per-segment slab ranges; dividing by
        # model_parallel removes the replication factor. "data" psum sums the
        # tile shards (each holds distinct rays).
        grads = jax.tree_util.tree_map(
            lambda g: g / model_parallel,
            jax.lax.psum(jax.lax.psum(grads_l, "data"), "model"),
        )
        loss = jax.lax.psum(jax.lax.psum(loss_l, "data"), "model") / model_parallel
        mse = jax.lax.psum(jax.lax.psum(sq_l, "data"), "model") / (
            model_parallel * n_total
        )
        return grads, loss, mse

    grads, loss, mse = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P()),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )(grid, rays_feat, pixels, theta)

    metrics = {
        "total_loss": loss,
        "specular_psnr": mse2psnr(mse),
    }
    updates, opt_state = tx.update(grads, opt_state, grid)
    grid = optax.apply_updates(grid, updates)
    return grid, opt_state, metrics


def _slab_geom(bst: BrickedStatics):
    from thr3ed_atom_tpu.rendering.bricked import _slab_geometry

    return _slab_geometry(bst)
