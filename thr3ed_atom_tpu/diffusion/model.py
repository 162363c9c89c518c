"""3inFusion: 3D diffusion over voxel-grid crops of a reconstructed scene.

Parity: reference thre3d_elements/thre3infusion/model.py (RandomCrop3D:44-71,
Thre3inFusionModel:74-353). TPU-native re-design:

  * the training grid is channels-LAST ([1, W, D, H, 4]: density ++ 3 feature channels)
  * RandomCrop3D is a vmapped ``lax.dynamic_slice`` with jax.random offsets — the whole
    crop batch materializes in one fused kernel
  * the train step (crop batch -> timesteps -> q_sample -> UNet -> loss -> Adam) is ONE
    jit with donated params/opt-state
  * sampling (p_sample_loop) is a single compiled lax.scan over timesteps
  * checkpoints are orbax-free msgpack-style npz of the param pytree + JSON config —
    never pickled module objects (cf. reference model.py:220-225)
"""
from __future__ import annotations

import json
from functools import partial
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from thr3ed_atom_tpu.diffusion.gaussian_diffusion import GaussianDiffusion
from thr3ed_atom_tpu.diffusion.timestep_sampler import UniformSampler
from thr3ed_atom_tpu.diffusion.unet import UNetModel
from thr3ed_atom_tpu.models.voxels import VoxelGrid, VoxelSize
from thr3ed_atom_tpu.modules.volumetric_model import (
    VolumetricModel,
    create_volumetric_model_from_saved_model,
)
from thr3ed_atom_tpu.rendering.rays import (
    compute_expected_density_scale_for_relu_field_grid,
)
from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
from thr3ed_atom_tpu.utils.camera import (
    CameraBounds,
    CameraIntrinsics,
    get_thre360_animation_poses,
)
from thr3ed_atom_tpu.utils.constants import CAMERA_INTRINSICS, HEMISPHERICAL_RADIUS
from thr3ed_atom_tpu.utils.logging import log


def random_crop_3d_batch(
    key: jax.Array, grid: jnp.ndarray, crop_size: Tuple[int, int, int], batch_size: int
) -> jnp.ndarray:
    """[W, D, H, C] -> [B, cw, cd, ch, C] random crops (reference model.py:44-71)."""
    dims = grid.shape[:3]
    maxvals = jnp.array(
        [max(d - c, 1) for d, c in zip(dims, crop_size)], dtype=jnp.int32
    )
    offsets = jax.random.randint(key, (batch_size, 3), 0, maxvals[None, :])

    def crop(offset):
        return jax.lax.dynamic_slice(
            grid,
            (offset[0], offset[1], offset[2], 0),
            (*crop_size, grid.shape[-1]),
        )

    return jax.vmap(crop)(offsets)


class Thre3inFusionModel:
    """UNet + diffusion over a scene's voxel grid; trains on random 3D crops and
    samples full grids that deserialize back into renderable VolumetricModels."""

    def __init__(self, unet: UNetModel, diffusion: GaussianDiffusion):
        self.unet = unet
        self.diffusion = diffusion
        self.params = None

        self.density_scale_range: Tuple[float, float] = (1.0, 1.0)
        self.features_scale_range: Tuple[float, float] = (1.0, 1.0)

        # defaults, overwritten by train() from the loaded scene (model.py:85-112)
        self.render_procedure_name = "render_sh_voxel_grid"
        self.render_config = SHVoxGridRenderConfig(
            num_samples_per_ray=256,
            camera_bounds=CameraBounds(near=4.5, far=19.5),
            white_bkgd=True,
        )
        self.voxel_size = VoxelSize(0.078125, 0.078125, 0.078125)
        self.hemispherical_radius = 12.0
        self.camera_pitch = 45.0
        self.camera_intrinsics = CameraIntrinsics(512, 512, 512.0)
        self.vox_grid_density_activations = {
            "density_preactivation": "identity",
            "density_postactivation": "softplus",
            "expected_density_scale": compute_expected_density_scale_for_relu_field_grid(
                (10.0, 10.0, 5.0)
            ),
        }

    # ------------------------------------------------------------------ init/apply

    def init_params(self, key: jax.Array, spatial: Tuple[int, int, int]):
        x = jnp.zeros((1, *spatial, self.unet.in_channels), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        self.params = self.unet.init(key, x, t)
        return self.params

    def model_fn(self, params):
        return lambda x, t: self.unet.apply(params, x, t)

    # ------------------------------------------------------------------ serialization

    @staticmethod
    def serialize_vol_mod_to_tensor_grid(vol_mod: VolumetricModel) -> jnp.ndarray:
        """VoxelGrid -> [1, W, D, H, 1+F] channels-last (model.py:127-134)."""
        grid = vol_mod.thre3d_repr
        return jnp.concatenate([grid.densities, grid.features], axis=-1)[None]

    def deserialize_tensor_grid_to_vol_mod(self, grid: jnp.ndarray) -> VolumetricModel:
        """[1, W, D, H, 1+F] -> renderable VolumetricModel (model.py:136-153)."""
        serialized = grid[0]
        densities, features = serialized[..., :1], serialized[..., 1:]
        voxel_grid = VoxelGrid(
            densities=densities,
            features=features,
            voxel_size=self.voxel_size,
            **self.vox_grid_density_activations,
        )
        return VolumetricModel(
            thre3d_repr=voxel_grid,
            render_procedure=self.render_procedure_name,
            render_config=self.render_config,
        )

    def scale_tensor_grids(self, grids: jnp.ndarray) -> jnp.ndarray:
        """Invert the per-channel-group [-1, 1] normalization (model.py:155-165)."""
        grids = grids * 0.5 + 0.5
        densities, features = grids[..., :1], grids[..., 1:]
        d_lo, d_hi = self.density_scale_range
        f_lo, f_hi = self.features_scale_range
        densities = densities * (d_hi - d_lo) + d_lo
        features = features * (f_hi - f_lo) + f_lo
        return jnp.concatenate([densities, features], axis=-1)

    # ------------------------------------------------------------------ sampling

    def sample(
        self,
        shape: Tuple[int, int, int],
        num_samples: int = 1,
        key: Optional[jax.Array] = None,
        max_iter: Optional[int] = None,
    ) -> jnp.ndarray:
        if key is None:
            key = jax.random.PRNGKey(0)
        full_shape = (num_samples, *shape, self.unet.in_channels)
        log.info(f"sampling {num_samples} grids from the diffusion model ...")
        return self.diffusion.p_sample_loop(
            self.model_fn(self.params),
            full_shape,
            key,
            clip_denoised=True,
            max_iter=max_iter,
        )

    def visualize_samples_mosaic(
        self,
        shape: Tuple[int, int, int],
        num_samples: int,
        save_path: Path,
        num_frames: int = 120,
        fps: float = 60.0,
        key: Optional[jax.Array] = None,
        render_scale_factor: Optional[float] = 0.25,
        max_iter: Optional[int] = None,
    ) -> None:
        """Sample grids -> per-sample thre360 videos -> square mosaic mp4
        (model.py:167-215)."""
        from thr3ed_atom_tpu.visualizations.animations import (
            render_camera_path_for_volumetric_model,
        )
        from thr3ed_atom_tpu.visualizations.video import write_video

        # sample sequentially: a batched reverse process over full-resolution grids
        # needs batch x whole-UNet activation memory (measured 58 GB for 9 x 128^3 x 28ch
        # — over any single chip's HBM); one-at-a-time fits comfortably
        if key is None:
            key = jax.random.PRNGKey(0)
        sample_keys = jax.random.split(key, num_samples)
        samples = jnp.concatenate(
            [
                self.sample(shape, 1, key=sample_keys[i], max_iter=max_iter)
                for i in range(num_samples)
            ]
        )
        samples = self.scale_tensor_grids(samples)

        videos = []
        log.info("Rendering videos for each sample ...")
        for i in range(num_samples):
            vol_mod = self.deserialize_tensor_grid_to_vol_mod(samples[i : i + 1])
            camera_path = get_thre360_animation_poses(
                hemispherical_radius=self.hemispherical_radius,
                camera_pitch=self.camera_pitch,
                num_poses=num_frames,
            )
            frames = render_camera_path_for_volumetric_model(
                vol_mod,
                camera_path,
                self.camera_intrinsics,
                render_scale_factor=render_scale_factor,
                verbose=False,
            )
            videos.append(frames)

        videos = np.stack(videos)  # [N, T, H, W3, 3]
        ncols = int(np.ceil(np.sqrt(num_samples)))
        nrows = int(np.ceil(num_samples / ncols))
        pad = ncols * nrows - num_samples
        if pad:
            videos = np.concatenate(
                [videos, np.zeros((pad, *videos.shape[1:]), videos.dtype)]
            )
        T, H, W, C = videos.shape[1:]
        mosaic = (
            videos.reshape(nrows, ncols, T, H, W, C)
            .transpose(2, 0, 3, 1, 4, 5)
            .reshape(T, nrows * H, ncols * W, C)
        )
        write_video(save_path, mosaic, fps=fps)

    # ------------------------------------------------------------------ io

    def save_model(self, save_path: Path) -> None:
        """Flat npz of parameter leaves + JSON of the UNet/diffusion config."""
        save_path = Path(save_path)
        save_path.parent.mkdir(parents=True, exist_ok=True)
        leaves, treedef = jax.tree_util.tree_flatten(self.params)
        np.savez(
            save_path.with_suffix(".npz"),
            **{f"param_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)},
        )
        meta = {
            "unet_config": {
                "in_channels": self.unet.in_channels,
                "model_channels": self.unet.model_channels,
                "out_channels": self.unet.out_channels,
                "num_res_blocks": self.unet.num_res_blocks,
                "attention_resolutions": list(self.unet.attention_resolutions),
                "channel_mult": list(self.unet.channel_mult),
                "dims": self.unet.dims,
                "num_heads": self.unet.num_heads,
                "use_scale_shift_norm": self.unet.use_scale_shift_norm,
                "use_bottleneck_attn": self.unet.use_bottleneck_attn,
                "use_checkpoint": self.unet.use_checkpoint,
            },
            "num_timesteps": self.diffusion.num_timesteps,
            "density_scale_range": list(self.density_scale_range),
            "features_scale_range": list(self.features_scale_range),
            "voxel_size": list(self.voxel_size),
        }
        with open(save_path.with_suffix(".json"), "w") as f:
            json.dump(meta, f, indent=2)

    def load_params(self, save_path: Path, spatial: Tuple[int, int, int]) -> None:
        """Rebuild the param pytree from npz using a template init."""
        template = self.init_params(jax.random.PRNGKey(0), spatial)
        leaves, treedef = jax.tree_util.tree_flatten(template)
        arrays = np.load(Path(save_path).with_suffix(".npz"))
        new_leaves = [jnp.asarray(arrays[f"param_{i}"]) for i in range(len(leaves))]
        self.params = jax.tree_util.tree_unflatten(treedef, new_leaves)

    # ------------------------------------------------------------------ training

    def train(
        self,
        volume_model_path: Path,
        output_path: Path,
        crop_ratio: float = 0.95,
        num_iters: int = 100_000,
        batch_size: int = 8,
        learning_rate: float = 3e-4,
        loss_feedback_frequency: int = 50,
        sample_frequency: int = 500,
        save_frequency: int = 1000,
        seed: int = 42,
        visualization_samples: int = 9,
    ):
        """The crop-diffusion training loop (reference model.py:227-353)."""
        from tensorboardX import SummaryWriter

        output_path = Path(output_path)
        vol_mod, extra_info = create_volumetric_model_from_saved_model(
            volume_model_path
        )

        # adopt the scene's render setup (model.py:246-251)
        self.render_config = vol_mod.render_config
        self.render_procedure_name = vol_mod.render_procedure_name
        self.voxel_size = vol_mod.thre3d_repr.voxel_size
        self.vox_grid_density_activations = {
            "density_preactivation": vol_mod.thre3d_repr.density_preactivation,
            "density_postactivation": vol_mod.thre3d_repr.density_postactivation,
            "expected_density_scale": vol_mod.thre3d_repr.expected_density_scale,
        }
        if HEMISPHERICAL_RADIUS in extra_info:
            self.hemispherical_radius = extra_info[HEMISPHERICAL_RADIUS]
        if CAMERA_INTRINSICS in extra_info:
            h, w, f = extra_info[CAMERA_INTRINSICS]
            self.camera_intrinsics = CameraIntrinsics(int(h), int(w), float(f))

        # normalize the grid per channel group to [-1, 1] (model.py:254-270)
        training_grid = self.serialize_vol_mod_to_tensor_grid(vol_mod)[0]  # [W,D,H,C]
        densities, features = training_grid[..., :1], training_grid[..., 1:]
        self.density_scale_range = (
            float(densities.min()),
            float(densities.max()),
        )
        self.features_scale_range = (
            float(features.min()),
            float(features.max()),
        )
        d_lo, d_hi = self.density_scale_range
        f_lo, f_hi = self.features_scale_range
        densities = (densities - d_lo) / max(d_hi - d_lo, 1e-12)
        features = (features - f_lo) / max(f_hi - f_lo, 1e-12)
        training_grid = jnp.concatenate([densities, features], axis=-1) * 2.0 - 1.0

        # crop size from the crop ratio (model.py:272-279), rounded down to the UNet's
        # resolution granularity (spatial dims must divide by 2^(levels-1) for the
        # skip concatenations to line up)
        full_grid_size = training_grid.shape[:3]
        crop_voxels = float(np.prod(full_grid_size)) * crop_ratio
        crop_size = int(np.ceil(crop_voxels ** (1.0 / 3.0)))
        crop_size = min(crop_size, *full_grid_size)
        granularity = 2 ** (len(self.unet.channel_mult) - 1)
        crop_size = max((crop_size // granularity) * granularity, granularity)
        training_crop_size = (crop_size,) * 3
        log.info(f"Full grid size: {full_grid_size}; crop size: {training_crop_size}")

        key = jax.random.PRNGKey(seed)
        key, init_key = jax.random.split(key)
        if self.params is None:
            self.init_params(init_key, training_crop_size)

        tx = optax.adam(learning_rate)
        opt_state = tx.init(self.params)
        timestep_sampler = UniformSampler(self.diffusion)
        timestep_p = jnp.asarray(
            timestep_sampler.weights() / timestep_sampler.weights().sum(),
            jnp.float32,
        )

        unet, diffusion = self.unet, self.diffusion

        @partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, grid, step_key):
            crop_key, t_key, noise_key = jax.random.split(step_key, 3)
            batch = random_crop_3d_batch(
                crop_key, grid, training_crop_size, batch_size
            )
            timesteps = jax.random.choice(
                t_key, diffusion.num_timesteps, (batch_size,), p=timestep_p
            )

            def loss_fn(p):
                terms = diffusion.training_losses(
                    lambda x, t: unet.apply(p, x, t), batch, timesteps, noise_key
                )
                return terms["loss"].mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        model_dir = output_path / "saved_models"
        sample_dir = output_path / "generated_samples"
        tensorboard_dir = output_path / "tensorboard_logs"
        for directory in (model_dir, sample_dir, tensorboard_dir):
            directory.mkdir(parents=True, exist_ok=True)
        tensorboard_writer = SummaryWriter(str(tensorboard_dir))

        log.info("Training the 3inFusion model ...")
        params = self.params
        for step in range(1, num_iters + 1):
            key, step_key = jax.random.split(key)
            params, opt_state, loss = train_step(
                params, opt_state, training_grid, step_key
            )

            if step % loss_feedback_frequency == 0:
                loss_value = float(loss)
                tensorboard_writer.add_scalar("loss", loss_value, step)
                log.info(f"Step {step}/{num_iters}: loss = {loss_value:.4f}")

            # save BEFORE sampling so a visualization failure never loses the model
            if step % save_frequency == 0:
                self.params = params
                log.info("Saving the model ...")
                self.save_model(model_dir / f"model_{step}")

            if step % sample_frequency == 0:
                self.params = params
                log.info("Creating intermediate samples for visualization ...")
                key, vis_key = jax.random.split(key)
                try:
                    self.visualize_samples_mosaic(
                        shape=tuple(full_grid_size),
                        num_samples=visualization_samples,
                        save_path=sample_dir / f"samples_{step}.mp4",
                        num_frames=60,
                        fps=24,
                        key=vis_key,
                    )
                except Exception as error:  # visualization is best-effort
                    log.info(
                        f"sample visualization failed ({type(error).__name__}: {error}); "
                        "continuing training"
                    )

        self.params = params
        self.save_model(model_dir / "model_final")
        return self
