"""Coarse-to-fine reconstruction trainer for SH voxel grids from posed images.

Parity: reference thre3d_atom/modules/trainers.py:49-514, re-designed TPU-first:

  * ONE jitted train step contains the whole hot loop body (reference trainers.py:271-341):
    ray/pixel batch sampling, ray casting from poses, specular + diffuse renders, L1
    losses, backward, Adam update. No per-iteration host work beyond the step call.
  * images/poses live in device HBM for the whole stage (the reference's GPU-cache tier
    made mandatory, datasets.py:77-115); ray batches are gathered in-jit.
  * stagewise grid growth is a jitted trilinear resize; each stage gets its own jit cache
    entry (4 total for the canonical recipe) since array shapes change.
  * optax.adam + exponential_decay(staircase) replaces torch Adam + ExponentialLR stepped
    every ``lr_decay_steps_per_stage`` (trainers.py:242-250, 389-393).
  * optional device mesh: the ray batch shards across chips (data parallel); with
    model_parallel > 1 the grid's x-axis additionally shards over a "model" axis
    (spatial tensor parallelism, XLA-inserted halo exchange). See parallel/mesh.py.
"""
from __future__ import annotations

import dataclasses
import time
from datetime import timedelta
from functools import partial
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from thr3ed_atom_tpu.data.dataset import PosedImagesDataset
from thr3ed_atom_tpu.models.voxels import (
    VoxelGrid,
    scale_voxel_grid_with_required_output_size,
)
from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
from thr3ed_atom_tpu.parallel.mesh import replicate, shard_batch
from thr3ed_atom_tpu.rendering.interface import Rays
from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
from thr3ed_atom_tpu.utils.camera import CameraPose
from thr3ed_atom_tpu.utils.constants import (
    CAMERA_BOUNDS,
    CAMERA_INTRINSICS,
    HEMISPHERICAL_RADIUS,
)
from thr3ed_atom_tpu.utils.logging import log
from thr3ed_atom_tpu.utils.metrics import mse2psnr
from thr3ed_atom_tpu.utils.misc import compute_thre3d_grid_sizes

# minimum training views averaged per gnomonic whole-pose step (auto mode).
# Chip A/B on the canonical 256^3 recipe: k=1 single-view steps at lr=0.03
# thrash the grid (stage-3 heldout 44.9 -> 31.1 dB); k=4 holds 42.4 dB at
# the same recipe. Whole-pose gradients are view-correlated, so per-step
# view diversity — not ray count — is what matters. (The mesh path gets its
# diversity from one-pose-per-device sharding instead.)
_GN_MIN_POSES_PER_STEP = 4


# ---------------------------------------------------------------------------- train step


@dataclasses.dataclass(frozen=True)
class TrainStepStatics:
    """Hashable statics that select the compiled train step."""

    render_config: SHVoxGridRenderConfig
    image_height: int
    image_width: int
    focal: float
    ray_batch_size: int
    apply_diffuse_render_regularization: bool = True
    # compute the diffuse regularization colour from the SAME samples/weights/gathered
    # rows as the specular render (one render pass instead of two; the loss is the same
    # unbiased estimator, with the two terms' Monte-Carlo noise correlated). Requires a
    # procedure that honors also_render_diffuse; set False for the reference's
    # independent-second-render semantics.
    fused_diffuse_render: bool = True
    use_mesh: bool = False
    # >1 shards the voxel grid's x-axis over a "model" mesh axis (spatial tensor
    # parallelism with XLA-inserted halo exchange); requires use_mesh
    model_parallel: int = 1
    # which registered render procedure the step differentiates through; the fast
    # two-phase procedure is exact at fast_topk >= num_samples_per_ray and at float
    # precision for fast_topk >= ~32 (tests/test_fast_renderer.py), while cutting the
    # gather volume ~8x
    render_procedure: str = "render_sh_voxel_grid_fast"


def _sample_ray_pixel_batch(
    key: jax.Array,
    images: jnp.ndarray,  # [N, H, W, 3]
    poses: jnp.ndarray,  # [N, 3, 4]
    statics: TrainStepStatics,
) -> Tuple[Rays, jnp.ndarray]:
    """Uniformly draw (image, pixel) pairs and cast their rays in-jit.

    TPU-native counterpart of the reference's cast-all-rays + randperm + slice
    (trainers.py:281-301): instead of materializing B*H*W rays per iteration, we draw
    ray_batch_size (image, pixel) indices over the WHOLE dataset and compute exactly
    those rays from the pose array. Uniform over all images is a strict superset of the
    reference's uniform-over-8-cached-images distribution.
    """
    height, width, focal = statics.image_height, statics.image_width, statics.focal
    num_images = images.shape[0]
    batch = statics.ray_batch_size

    key_img, key_pix = jax.random.split(key)
    img_idx = jax.random.randint(key_img, (batch,), 0, num_images)
    pix_idx = jax.random.randint(key_pix, (batch,), 0, height * width)
    py = pix_idx // width
    px = pix_idx % width

    pixels = images[img_idx, py, px]  # [B, 3]

    # pinhole directions through pixel centers (parity with rays.cast_rays)
    x = px.astype(jnp.float32) + 0.5
    y = py.astype(jnp.float32) + 0.5
    dirs_cam = jnp.stack(
        [
            (x - width * 0.5) / focal,
            -(y - height * 0.5) / focal,
            -jnp.ones_like(x),
        ],
        axis=-1,
    )  # [B, 3]

    rotations = poses[img_idx, :, :3]  # [B, 3, 3]
    translations = poses[img_idx, :, 3]  # [B, 3]
    rays_d = jnp.einsum("bij,bj->bi", rotations, dirs_cam,
                        precision=jax.lax.Precision.HIGHEST)
    return Rays(origins=translations, directions=rays_d), pixels


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3))
def _train_step(
    statics: TrainStepStatics,
    tx: optax.GradientTransformation,
    grid: VoxelGrid,
    opt_state,
    images: jnp.ndarray,
    poses: jnp.ndarray,
    key: jax.Array,
):
    """One fused optimization step; returns (grid, opt_state, metrics)."""
    key_batch, key_specular, key_diffuse = jax.random.split(key, 3)
    rays, pixels = _sample_ray_pixel_batch(key_batch, images, poses, statics)

    if statics.use_mesh:
        from thr3ed_atom_tpu.parallel.mesh import (
            make_data_mesh,
            make_grid_mesh,
            shard_grid_spatial,
        )

        if statics.model_parallel > 1:
            mesh = make_grid_mesh(statics.model_parallel)
            rays = shard_batch(mesh, rays)
            pixels = shard_batch(mesh, pixels)
            grid = shard_grid_spatial(mesh, grid)
        else:
            mesh = make_data_mesh()
            rays = shard_batch(mesh, rays)
            pixels = shard_batch(mesh, pixels)
            grid = replicate(mesh, grid)

    from thr3ed_atom_tpu.rendering.renderer import RENDER_PROCEDURES

    procedure = RENDER_PROCEDURES[statics.render_procedure]
    fuse_diffuse = (
        statics.apply_diffuse_render_regularization
        and statics.fused_diffuse_render
        and statics.render_procedure != "render_sh_voxel_grid"  # exact path: no hook
    )
    specular_config = statics.render_config.replace(also_render_diffuse=fuse_diffuse)
    diffuse_config = statics.render_config.replace(render_diffuse=True)

    def loss_fn(g: VoxelGrid):
        specular = procedure(g, rays, specular_config, key_specular)
        specular_loss = jnp.mean(jnp.abs(specular.colour - pixels))
        specular_mse = jnp.mean((specular.colour - pixels) ** 2)
        total = specular_loss
        aux = {
            "specular_loss": specular_loss,
            "specular_psnr": mse2psnr(specular_mse),
        }
        if statics.apply_diffuse_render_regularization:
            if fuse_diffuse:
                from thr3ed_atom_tpu.utils.constants import EXTRA_DIFFUSE_COLOUR

                diffuse_colour = specular.extra[EXTRA_DIFFUSE_COLOUR]
            else:
                diffuse_colour = procedure(g, rays, diffuse_config, key_diffuse).colour
            diffuse_loss = jnp.mean(jnp.abs(diffuse_colour - pixels))
            diffuse_mse = jnp.mean((diffuse_colour - pixels) ** 2)
            total = total + diffuse_loss
            aux |= {
                "diffuse_loss": diffuse_loss,
                "diffuse_psnr": mse2psnr(diffuse_mse),
            }
        aux["total_loss"] = total
        return total, aux

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(grid)
    updates, opt_state = tx.update(grads, opt_state, grid)
    grid = optax.apply_updates(grid, updates)
    return grid, opt_state, metrics


# --------------------------------------------------------------- optimizer checkpoints


def _opt_state_path(model_path: Path) -> Path:
    # checkpoints are written from a suffix-less stem, but --resume_from is
    # usually given the model's ".npz" path — accept both spellings
    base = str(model_path)
    if base.endswith(".npz"):
        base = base[: -len(".npz")]
    return Path(base + "_opt.npz")


def save_optimizer_state(model_path: Path, opt_state, stage: int,
                         stage_iteration: int) -> None:
    """Adam moments + schedule count alongside the model npz, so --resume_from is
    trajectory-faithful (moments at lr=0.03 matter; a fresh Adam is not)."""
    leaves = jax.tree_util.tree_leaves(opt_state)
    np.savez(
        str(_opt_state_path(model_path)),
        stage=np.int64(stage),
        stage_iteration=np.int64(stage_iteration),
        **{f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)},
    )


def load_optimizer_state(model_path: Path, template):
    """(opt_state, stage, stage_iteration) from <model>_opt.npz, or None when the
    file is absent or its leaves don't match the template's shapes."""
    path = _opt_state_path(model_path)
    if not path.exists():
        return None
    data = np.load(str(path))
    leaves, treedef = jax.tree_util.tree_flatten(template)
    restored = []
    for i, leaf in enumerate(leaves):
        name = f"leaf_{i}"
        if name not in data or data[name].shape != jnp.shape(leaf):
            return None
        restored.append(jnp.asarray(data[name], jnp.asarray(leaf).dtype))
    return (
        jax.tree_util.tree_unflatten(treedef, restored),
        int(data["stage"]),
        int(data["stage_iteration"]),
    )


def _bricked_mesh_shape(b_statics, n_dev: int, model_parallel: int):
    """(data_parallel, model_parallel) for bricked_train_step_mesh over n_dev
    devices: tiles shard over "data", depth segments over "model". Pure tile
    parallelism is preferred (depth segments forfeit per-segment early exit and
    replicate the repack); an explicit model_parallel > 1 request is honored
    first when divisibility allows."""
    from thr3ed_atom_tpu.rendering.bricked import _slab_geometry

    num_groups = _slab_geometry(b_statics.bricked)[3]
    num_tiles = b_statics.num_tiles
    if model_parallel > 1:
        dp = n_dev // model_parallel
        if dp >= 1 and num_groups % model_parallel == 0 and num_tiles % dp == 0:
            return dp, model_parallel
    # maximize devices used; among equal totals prefer the largest tile (data)
    # axis — a shape may use fewer than n_dev devices (the mesh step builds its
    # mesh over dp*mp devices only)
    best = (1, 1)
    for total in range(n_dev, 1, -1):
        for mp in range(1, total + 1):
            if total % mp or num_groups % mp:
                continue
            dp = total // mp
            if num_tiles % dp == 0:
                return dp, mp
    return best


# ------------------------------------------------------------------------- procedure


def train_sh_vox_grid_vol_mod_with_posed_images(
    vol_mod: VolumetricModel,
    train_dataset: PosedImagesDataset,
    output_dir: Path,
    test_dataset: Optional[PosedImagesDataset] = None,
    ray_batch_size: int = 32768,
    num_stages: int = 4,
    num_iterations_per_stage: int = 2000,
    scale_factor: float = 2.0,
    learning_rate: float = 0.03,
    lr_decay_gamma_per_stage: float = 0.1,
    lr_decay_steps_per_stage: int = 1000,
    stagewise_lr_decay_gamma: float = 0.9,
    render_feedback_pose: Optional[CameraPose] = None,
    save_freq: int = 1000,
    test_freq: int = 1000,
    feedback_freq: int = 100,
    summary_freq: int = 10,
    apply_diffuse_render_regularization: bool = True,
    use_mesh: bool = False,
    verbose_rendering: bool = True,
    fast_debug_mode: bool = False,
    seed: int = 42,
    resume_from: Optional[Path] = None,
    gnomonic_poses_per_step: int = 0,
    mesh_devices: int = 0,  # with use_mesh: clamp the mesh width (0 = all)
) -> VolumetricModel:
    """Coarse-to-fine training loop (reference trainers.py:49-491 anatomy preserved):
    per stage — fresh Adam at stagewise-decayed LR, exponential in-stage decay, jitted
    hot loop, periodic TB summaries / feedback renders / heldout tests / checkpoints;
    between stages — 2x trilinear grid growth."""
    from tensorboardX import SummaryWriter

    from thr3ed_atom_tpu.modules.tester import (
        test_sh_vox_grid_vol_mod_with_posed_images,
    )
    from thr3ed_atom_tpu.visualizations.static import (
        visualize_camera_rays,
        visualize_sh_vox_grid_vol_mod_rendered_feedback,
    )

    output_dir = Path(output_dir)
    model_dir = output_dir / "saved_models"
    logs_dir = output_dir / "training_logs"
    tensorboard_dir = logs_dir / "tensorboard"
    render_dir = logs_dir / "rendered_output"
    for directory in (model_dir, logs_dir, tensorboard_dir, render_dir):
        directory.mkdir(exist_ok=True, parents=True)

    # stage plan
    stagewise_voxel_grid_sizes = compute_thre3d_grid_sizes(
        final_required_resolution=vol_mod.thre3d_repr.grid_dims,
        num_stages=num_stages,
        scale_factor=scale_factor,
    )

    # per-stage downsampled datasets (reference trainers.py:131-139)
    dataset_config = train_dataset.get_config_dict()
    base_downsample = dataset_config["downsample_factor"]
    stagewise_train_datasets = [train_dataset]
    for stage in range(1, num_stages):
        config = dict(dataset_config)
        config["downsample_factor"] = base_downsample * (scale_factor**stage)
        stagewise_train_datasets.insert(0, PosedImagesDataset(**config))

    key = jax.random.PRNGKey(seed)
    start_stage = 1
    start_iteration = 1
    resume_opt_source: Optional[Path] = None
    if resume_from is not None:
        # resume: adopt the checkpointed grid AND (when the sibling _opt.npz exists)
        # the optimizer state + exact (stage, iteration), making the resumed
        # trajectory Adam-faithful; legacy checkpoints without it restart AT the
        # stage whose grid size matches, from iteration 1 with a fresh optimizer
        # (the reference has no resume at all, SURVEY.md §5.3)
        from thr3ed_atom_tpu.modules.volumetric_model import (
            create_volumetric_model_from_saved_model,
        )

        resume_from = Path(resume_from)
        loaded, _ = create_volumetric_model_from_saved_model(resume_from)
        vol_mod.thre3d_repr = loaded.thre3d_repr
        loaded_dims = loaded.thre3d_repr.grid_dims
        matches = [
            i for i, size in enumerate(stagewise_voxel_grid_sizes) if size == loaded_dims
        ]
        assert matches, (
            f"checkpoint grid {loaded_dims} matches no stage of the plan "
            f"{stagewise_voxel_grid_sizes}"
        )
        if _opt_state_path(resume_from).exists():
            saved = np.load(str(_opt_state_path(resume_from)))
            saved_stage = int(saved["stage"])
            saved_iter = int(saved["stage_iteration"])
            if saved_iter < num_iterations_per_stage:
                # mid-stage checkpoint: continue the same stage
                start_stage = saved_stage
                start_iteration = saved_iter + 1
                resume_opt_source = resume_from
            else:
                # end-of-stage checkpoint: grow and start the next stage fresh
                start_stage = saved_stage + 1
                if saved_stage < num_stages:
                    vol_mod.thre3d_repr = scale_voxel_grid_with_required_output_size(
                        vol_mod.thre3d_repr,
                        output_size=stagewise_voxel_grid_sizes[saved_stage],
                    )
        else:
            # the checkpointed grid already has stage `matches[0] + 1`'s size, so
            # no rescale is needed before re-entering that stage
            start_stage = matches[0] + 1
            log.warning(
                f"no optimizer state found at {_opt_state_path(resume_from)}; "
                f"re-entering stage {start_stage} from iteration 1 with a "
                "fresh optimizer"
            )
        log.info(
            f"resuming from {resume_from} at stage {start_stage} "
            f"iteration {start_iteration}"
        )
    else:
        # downscale grid to the smallest stage size and re-init from uniform(-1, 1)
        key, key_d, key_f = jax.random.split(key, 3)
        small_grid = scale_voxel_grid_with_required_output_size(
            vol_mod.thre3d_repr, output_size=stagewise_voxel_grid_sizes[0]
        )
        vol_mod.thre3d_repr = dataclasses.replace(
            small_grid,
            densities=jax.random.uniform(
                key_d, small_grid.densities.shape, minval=-1.0, maxval=1.0
            ),
            features=jax.random.uniform(
                key_f, small_grid.features.shape, minval=-1.0, maxval=1.0
            ),
        )

    # feedback pose: first test (or train) image's pose
    feedback_dataset = test_dataset if test_dataset is not None else train_dataset
    real_feedback_image = None
    if render_feedback_pose is None:
        pose0 = feedback_dataset.poses[0]
        render_feedback_pose = CameraPose(
            rotation=pose0[:, :3], translation=pose0[:, 3:]
        )
        real_feedback_image = feedback_dataset.images[0]

    if real_feedback_image is not None:
        import imageio.v2 as imageio

        from thr3ed_atom_tpu.utils.camera import to8b

        imageio.imwrite(render_dir / "1__real_log.png", to8b(real_feedback_image))

    camera_bounds = train_dataset.camera_bounds
    camera_intrinsics = train_dataset.camera_intrinsics
    dataset_size = len(train_dataset) * camera_intrinsics.height * camera_intrinsics.width

    tensorboard_writer = SummaryWriter(str(tensorboard_dir))

    if not fast_debug_mode:
        log.info("creating camera-rays visualization...")
        visualize_camera_rays(train_dataset, output_dir, num_rays_per_image=1)

    log.info("beginning training")
    time_spent_actually_training = 0.0

    extra_info = {
        CAMERA_BOUNDS: list(camera_bounds),
        CAMERA_INTRINSICS: list(camera_intrinsics),
        HEMISPHERICAL_RADIUS: train_dataset.get_hemispherical_radius_estimate(),
    }

    for stage in range(start_stage, num_stages + 1):
        if stage > start_stage:
            # drop the previous stage's compiled executables (their HBM code +
            # embedded-constant allocations accumulate across stages — at the
            # 256^3 stage the live step programs need every GiB of headroom;
            # the canonical 4x7000 run OOM'd at stage 4 without this). The
            # persistent compilation cache makes any re-entry cheap.
            import gc

            jax.clear_caches()
            vol_mod.drop_prepared_cache()
            gc.collect()
        stage_dataset = stagewise_train_datasets[stage - 1]
        stage_intrinsics = stage_dataset.camera_intrinsics
        images = jnp.asarray(stage_dataset.images)
        poses = jnp.asarray(stage_dataset.poses)

        current_stage_lr = learning_rate * (stagewise_lr_decay_gamma ** (stage - 1))
        schedule = optax.exponential_decay(
            init_value=current_stage_lr,
            transition_steps=lr_decay_steps_per_stage,
            decay_rate=lr_decay_gamma_per_stage,
            staircase=True,
        )
        tx = optax.adam(learning_rate=schedule, b1=0.9, b2=0.999)
        grid = vol_mod.thre3d_repr
        opt_state = tx.init(grid)
        if resume_opt_source is not None and stage == start_stage:
            restored = load_optimizer_state(resume_opt_source, opt_state)
            if restored is not None:
                opt_state = restored[0]
                log.info("restored optimizer state (Adam moments + schedule count)")
            else:
                log.info("optimizer checkpoint incompatible; starting a fresh Adam")

        use_bricked = (
            vol_mod.render_procedure_name == "render_sh_voxel_grid_bricked"
        )
        use_gnomonic = (
            vol_mod.render_procedure_name == "render_sh_voxel_grid_gnomonic"
        )
        statics = TrainStepStatics(
            render_config=vol_mod.render_config,
            image_height=stage_intrinsics.height,
            image_width=stage_intrinsics.width,
            focal=stage_intrinsics.focal,
            ray_batch_size=ray_batch_size,
            apply_diffuse_render_regularization=apply_diffuse_render_regularization,
            use_mesh=use_mesh,
            render_procedure=vol_mod.render_procedure_name,
        )
        if use_bricked:
            from thr3ed_atom_tpu.modules.bricked_trainer import (
                bricked_train_step,
                bricked_train_step_mesh,
                make_bricked_train_statics,
            )
            from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose

            poses_np = np.asarray(stage_dataset.poses)
            # the march (axis, flip) variant is a HOST decision (a static of the
            # compiled step; at most 6 program variants). The slab repack depends
            # only on the variant — not the pose — so each step mixes tiles from
            # EVERY training view sharing the variant (view-dependent SH terms
            # need multi-view gradients within a step).
            pose_picker = np.random.default_rng(seed + stage)
            variant_buckets = {}
            for p_i in range(len(poses_np)):
                v = dominant_axis_for_pose(poses_np[p_i][:, :3])
                variant_buckets.setdefault(v, []).append(p_i)
            bucket_variants = list(variant_buckets)
            bucket_weights = np.array(
                [len(variant_buckets[v]) for v in bucket_variants], np.float64
            )
            bucket_weights /= bucket_weights.sum()
            if use_mesh:
                log.info(
                    f"bricked mesh training over {jax.device_count()} devices "
                    "(tiles x depth-segments)"
                )
        if use_gnomonic:
            from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose
            from thr3ed_atom_tpu.rendering.gnomonic_train import (
                gnomonic_train_step,
                gnomonic_train_step_mesh,
                gnomonic_train_step_multi,
                make_gnomonic_train_statics,
            )

            poses_np = np.asarray(stage_dataset.poses)
            # whole-pose steps: each iteration trains EVERY pixel of one view.
            # The march (axis, flip) variant AND the matmul warp's pass order
            # are host decisions (<= 12 compiled step programs per stage,
            # cached by GnomonicTrainStatics hash).
            from thr3ed_atom_tpu.rendering.warp_matmul import (
                warp_swap_for_pose,
            )

            def _gn_variant(i):
                a, f = dominant_axis_for_pose(poses_np[i][:, :3])
                swap = warp_swap_for_pose(
                    poses_np[i][:, :3], a, f, stage_intrinsics.height,
                    stage_intrinsics.width, stage_intrinsics.focal,
                )
                return a, f, swap

            pose_variants = [_gn_variant(i) for i in range(len(poses_np))]
            gnomonic_tstats = {}
            pose_picker = np.random.default_rng(seed + stage)
            gn_variant_buckets = {}
            for p_i, v in enumerate(pose_variants):
                gn_variant_buckets.setdefault(v, []).append(p_i)
            gn_bucket_variants = list(gn_variant_buckets)
            gn_bucket_weights = np.array(
                [len(gn_variant_buckets[v]) for v in gn_bucket_variants],
                np.float64,
            )
            gn_bucket_weights /= gn_bucket_weights.sum()
            gn_mesh_devices = 1
            if use_mesh:
                gn_mesh_devices = jax.device_count()
                if mesh_devices > 0:
                    gn_mesh_devices = min(gn_mesh_devices, mesh_devices)
            if use_mesh:
                log.info(
                    f"gnomonic mesh training over {gn_mesh_devices} devices "
                    "(whole training views, pose-parallel)"
                )
            # honour the requested ray budget: when a whole pose is fewer rays
            # than ray_batch_size (small training resolutions), accumulate
            # gradients over k poses per step (sequential scan, single-pose
            # HBM footprint) so equal-iteration comparisons against the
            # ray-batch trainers see equal data
            _pose_rays = stage_intrinsics.height * stage_intrinsics.width
            if gnomonic_poses_per_step > 0:
                gn_target_poses = gnomonic_poses_per_step
            else:
                # ray-budget matching alone would let high-res stages
                # degenerate to single-view steps; whole-pose gradients are
                # view-correlated, and k=1 steps at the canonical lr=0.03
                # measurably thrash the grid (canonical-run stage 3:
                # heldout 44.9 -> 31.1 dB). Floor per-step view diversity.
                gn_target_poses = max(
                    _GN_MIN_POSES_PER_STEP, round(ray_batch_size / _pose_rays)
                )
            if use_mesh:
                # the floor composes with mesh width: each device accumulates
                # ceil(target / n_dev) poses so a 2-device mesh still sees >=
                # _GN_MIN_POSES_PER_STEP distinct views per step
                gn_poses_per_step = -(-gn_target_poses // gn_mesh_devices)
            else:
                gn_poses_per_step = gn_target_poses
            # the gnomonic analogue of the reference's stratified-jitter flag:
            # per-step sub-texel phase shift of the resample frame (unbiased)
            gn_jitter = bool(vol_mod.render_config.perturb_sampled_points)
            if gn_poses_per_step > 1:
                log.info(
                    f"gnomonic whole-pose steps accumulate {gn_poses_per_step}"
                    f" poses/step ({_pose_rays} rays/pose vs ray_batch_size "
                    f"{ray_batch_size})"
                )
        rays_per_step = (
            stage_intrinsics.height * stage_intrinsics.width
            * gn_mesh_devices * gn_poses_per_step
            if use_gnomonic
            else ray_batch_size
        )

        log.info(
            f"training stage: {stage}   voxel grid resolution: {grid.grid_dims} "
            f"training images resolution: [{stage_intrinsics.height} x {stage_intrinsics.width}]"
        )
        log.info(f"current stage learning rate: {current_stage_lr}")

        from thr3ed_atom_tpu.utils.profiling import ThroughputMeter

        # the meter must tick at SYNC points (dispatch is async; per-step ticks would
        # measure the Python dispatch rate, not device throughput)
        rays_meter = ThroughputMeter(window=8)
        steps_since_sync = 0
        last_time = time.perf_counter()
        stage_first_iteration = start_iteration if stage == start_stage else 1
        for stage_iteration in range(
            stage_first_iteration, num_iterations_per_stage + 1
        ):
            key, step_key = jax.random.split(key)
            if use_bricked:
                b_axis, b_flip = bucket_variants[
                    int(pose_picker.choice(len(bucket_variants), p=bucket_weights))
                ]
                bucket = variant_buckets[(b_axis, b_flip)]
                b_statics = make_bricked_train_statics(
                    grid,
                    b_axis,
                    b_flip,
                    image_height=stage_intrinsics.height,
                    image_width=stage_intrinsics.width,
                    focal=stage_intrinsics.focal,
                    ray_batch_size=ray_batch_size,
                    white_bkgd=vol_mod.render_config.white_bkgd,
                    apply_diffuse_render_regularization=(
                        apply_diffuse_render_regularization
                    ),
                    exit_eps=vol_mod.render_config.bricked_exit_eps,
                    # occupancy skipping stays OFF in training (zero-gradient
                    # absorbing state); the render config's threshold applies to
                    # inference renders only
                    tile_px=vol_mod.render_config.bricked_tile_px,
                    interpret=jax.default_backend() == "cpu",
                    axis_supersample=(
                        vol_mod.render_config.bricked_axis_supersample
                    ),
                )
                tile_pose_idx = jnp.asarray(
                    pose_picker.choice(bucket, size=b_statics.num_tiles),
                    jnp.int32,
                )
                if use_mesh and jax.device_count() > 1:
                    mesh_shape = _bricked_mesh_shape(
                        b_statics, jax.device_count(), 1
                    )
                    grid, opt_state, metrics = bricked_train_step_mesh(
                        b_statics, tx, mesh_shape, grid, opt_state, images,
                        poses, tile_pose_idx, step_key,
                    )
                else:
                    grid, opt_state, metrics = bricked_train_step(
                        b_statics, tx, grid, opt_state, images, poses,
                        tile_pose_idx, step_key,
                    )
            elif use_gnomonic:
                variant = gn_bucket_variants[
                    int(pose_picker.choice(len(gn_bucket_variants),
                                           p=gn_bucket_weights))
                ]
                tstat = gnomonic_tstats.get(variant)
                if tstat is None:
                    tstat = make_gnomonic_train_statics(
                        grid,
                        variant[0],
                        variant[1],
                        image_height=stage_intrinsics.height,
                        image_width=stage_intrinsics.width,
                        white_bkgd=vol_mod.render_config.white_bkgd,
                        apply_diffuse_render_regularization=(
                            apply_diffuse_render_regularization
                        ),
                        pos_per_cell=vol_mod.render_config.gnomonic_pos_per_cell,
                        supersample=vol_mod.render_config.gnomonic_supersample,
                        warp_order=vol_mod.render_config.gnomonic_warp_order,
                        interpret=jax.default_backend() == "cpu",
                        qb=getattr(vol_mod.render_config, "gnomonic_qb", 0),
                        warp_impl=getattr(
                            vol_mod.render_config, "gnomonic_warp_impl", "auto"
                        ),
                        warp_swap=variant[2],
                    )
                    gnomonic_tstats[variant] = tstat
                bucket = gn_variant_buckets[variant]
                if gn_mesh_devices > 1:
                    idx = jnp.asarray(
                        pose_picker.choice(
                            bucket,
                            size=(gn_mesh_devices, gn_poses_per_step),
                        )
                    )
                    grid, opt_state, metrics = gnomonic_train_step_mesh(
                        tstat, tx, gn_mesh_devices, grid, opt_state,
                        images[idx], poses[idx, :, :3], poses[idx, :, 3],
                        jnp.float32(stage_intrinsics.focal),
                        step_key if gn_jitter else None,
                    )
                elif gn_poses_per_step > 1:
                    idx = jnp.asarray(
                        pose_picker.choice(bucket, size=gn_poses_per_step)
                    )
                    grid, opt_state, metrics = gnomonic_train_step_multi(
                        tstat, tx, grid, opt_state,
                        images[idx], poses[idx, :, :3], poses[idx, :, 3],
                        jnp.float32(stage_intrinsics.focal),
                        step_key if gn_jitter else None,
                    )
                else:
                    p_i = int(pose_picker.choice(bucket))
                    grid, opt_state, metrics = gnomonic_train_step(
                        tstat, tx, grid, opt_state,
                        images[p_i], poses[p_i, :, :3], poses[p_i, :, 3],
                        jnp.float32(stage_intrinsics.focal),
                        step_key if gn_jitter else None,
                    )
            else:
                grid, opt_state, metrics = _train_step(
                    statics, tx, grid, opt_state, images, poses, step_key
                )
            steps_since_sync += 1

            global_step = (stage - 1) * num_iterations_per_stage + stage_iteration
            is_edge = stage_iteration == 1 or stage_iteration == num_iterations_per_stage

            if global_step % summary_freq == 0 or is_edge:
                metrics_host = {k: float(v) for k, v in metrics.items()}  # syncs
                rays_meter.tick(rays_per_step * steps_since_sync)
                steps_since_sync = 0
                metrics_host["num_epochs"] = rays_per_step * global_step / dataset_size
                metrics_host["train_rays_per_sec"] = rays_meter.per_sec
                for name, value in metrics_host.items():
                    tensorboard_writer.add_scalar(name, value, global_step=global_step)
                log.info(
                    f"Stage: {stage} Global Iteration: {global_step} "
                    f"Stage Iteration: {stage_iteration} "
                    + " ".join(f"{k}: {v:.3f}" for k, v in metrics_host.items())
                )

            time_spent_actually_training += time.perf_counter() - last_time

            if (global_step % feedback_freq == 0 or is_edge) and not fast_debug_mode:
                vol_mod.thre3d_repr = grid
                log.info(
                    "TIME CHECK: time spent actually training till now: "
                    f"{timedelta(seconds=time_spent_actually_training)}"
                )
                visualize_sh_vox_grid_vol_mod_rendered_feedback(
                    vol_mod=vol_mod,
                    render_feedback_pose=render_feedback_pose,
                    camera_intrinsics=camera_intrinsics,
                    global_step=global_step,
                    feedback_logs_dir=render_dir,
                    training_time=time_spent_actually_training,
                    log_diffuse_rendered_version=apply_diffuse_render_regularization,
                    overridden_num_samples_per_ray=vol_mod.render_config.render_num_samples_per_ray,
                    verbose_rendering=verbose_rendering,
                )
                # the feedback render's prepared tables (~2.7 GB at 256^3)
                # must not stay resident across the next train step
                vol_mod.drop_prepared_cache()

            if (
                test_dataset is not None
                and not fast_debug_mode
                and (
                    global_step % test_freq == 0
                    or stage_iteration == num_iterations_per_stage
                )
            ):
                vol_mod.thre3d_repr = grid
                test_sh_vox_grid_vol_mod_with_posed_images(
                    vol_mod=vol_mod,
                    test_dataset=test_dataset,
                    tensorboard_writer=tensorboard_writer,
                    global_step=global_step,
                )
                vol_mod.drop_prepared_cache()

            if global_step % save_freq == 0 or is_edge:
                vol_mod.thre3d_repr = grid
                ckpt_path = model_dir / f"model_stage_{stage}_iter_{global_step}"
                vol_mod.save(ckpt_path, extra_info=extra_info)
                save_optimizer_state(ckpt_path, opt_state, stage, stage_iteration)

            last_time = time.perf_counter()

        vol_mod.thre3d_repr = grid
        if stage != num_stages:
            vol_mod.thre3d_repr = scale_voxel_grid_with_required_output_size(
                vol_mod.thre3d_repr, output_size=stagewise_voxel_grid_sizes[stage]
            )

    vol_mod.save(model_dir / "model_final", extra_info=extra_info)
    log.info("Training complete")
    log.info(
        f"Total actual training time: {timedelta(seconds=time_spent_actually_training)}"
    )
    return vol_mod
