"""A/B the bricked trainer's quality knobs against the parity recipe.

Usage: python experiments/parity/ab_bricked.py <name> [tile_px] [exit_eps]
Trains the parity recipe (2 stages x 500 iters, 64^3 final, 2048 rays) with the
bricked procedure and the given tile size, into /tmp/ab_<name>.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import jax

from thr3ed_atom_tpu.data.dataset import PosedImagesDataset
from thr3ed_atom_tpu.models.voxels import VoxelSize, create_voxel_grid
from thr3ed_atom_tpu.modules.trainer import train_sh_vox_grid_vol_mod_with_posed_images
from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
from thr3ed_atom_tpu.utils.constants import SEED
from thr3ed_atom_tpu.rendering.rays import (
    compute_expected_density_scale_for_relu_field_grid,
)

name = sys.argv[1]
tile_px = int(sys.argv[2]) if len(sys.argv) > 2 else 0
exit_eps = float(sys.argv[3]) if len(sys.argv) > 3 else 1e-4
ssaa = int(sys.argv[4]) if len(sys.argv) > 4 else 1

import os
data = Path(os.environ.get("DS", "/tmp/parity_ds"))
train_dataset = PosedImagesDataset(
    images_dir=data / "train",
    camera_params_json=data / "train_camera_params.json",
    downsample_factor=1.0,
    rgba_white_bkgd=True,
)
test_dataset = PosedImagesDataset(
    images_dir=data / "test",
    camera_params_json=data / "test_camera_params.json",
    downsample_factor=1.0,
    rgba_white_bkgd=True,
)

FINAL = 64
grid = create_voxel_grid(
    jax.random.PRNGKey(SEED),
    grid_dims=(FINAL,) * 3,
    num_features=27,
    voxel_size=VoxelSize(*(3.0 / FINAL,) * 3),
    density_preactivation="identity",
    density_postactivation="relu",
    expected_density_scale=compute_expected_density_scale_for_relu_field_grid(
        (3.0, 3.0, 3.0)
    ),
)
config = SHVoxGridRenderConfig(
    num_samples_per_ray=128,
    render_num_samples_per_ray=256,
    camera_bounds=train_dataset.camera_bounds,
    white_bkgd=True,
    bricked_tile_px=tile_px,
    bricked_exit_eps=exit_eps,
    bricked_axis_supersample=ssaa,
)
vol_mod = VolumetricModel(
    grid, render_procedure="render_sh_voxel_grid_bricked", render_config=config
)
train_sh_vox_grid_vol_mod_with_posed_images(
    vol_mod,
    train_dataset,
    Path(f"/tmp/ab_{name}"),
    test_dataset=test_dataset,
    ray_batch_size=2048,
    num_stages=2,
    num_iterations_per_stage=500,
    learning_rate=0.03,
    lr_decay_steps_per_stage=3000,
    lr_decay_gamma_per_stage=0.1,
    stagewise_lr_decay_gamma=1.0,
    save_freq=500,
    test_freq=500,
    feedback_freq=500,
    summary_freq=100,
    verbose_rendering=False,
)
