"""Does bricked training degrade an already-good grid?

Loads the classic-trained 64^3 checkpoint (fast-eval 34.2 dB on parity_ds2) and
runs bricked train steps; logs train loss + fast-eval/bricked-eval heldout PSNR
every 100 iters. If the train loss improves while fast-eval PSNR drifts down,
the bricked forward model (slab quadrature / bf16) is biased w.r.t. the GT.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from thr3ed_atom_tpu.data.dataset import PosedImagesDataset
from thr3ed_atom_tpu.modules.bricked_trainer import (
    bricked_train_step,
    make_bricked_train_statics,
)
from thr3ed_atom_tpu.modules.tester import test_sh_vox_grid_vol_mod_with_posed_images
from thr3ed_atom_tpu.modules.volumetric_model import (
    VolumetricModel,
    create_volumetric_model_from_saved_model,
)
from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose

TILE_PX = int(sys.argv[1]) if len(sys.argv) > 1 else 8
EXIT_EPS = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-4
LR = float(sys.argv[3]) if len(sys.argv) > 3 else 0.03
SSAA = int(sys.argv[4]) if len(sys.argv) > 4 else 1

data = Path("/tmp/parity_ds2")
train_dataset = PosedImagesDataset(
    images_dir=data / "train", camera_params_json=data / "train_camera_params.json",
    downsample_factor=1.0, rgba_white_bkgd=True,
)
test_dataset = PosedImagesDataset(
    images_dir=data / "test", camera_params_json=data / "test_camera_params.json",
    downsample_factor=1.0, rgba_white_bkgd=True,
)

base, _ = create_volumetric_model_from_saved_model(
    Path("/tmp/parity2_ours_fast/saved_models/model_final")
)
grid = base.thre3d_repr
print("grid:", grid.grid_dims)

images = jnp.asarray(train_dataset.images)
poses = jnp.asarray(train_dataset.poses)
poses_np = np.asarray(train_dataset.poses)
h, w = train_dataset.camera_intrinsics.height, train_dataset.camera_intrinsics.width
focal = float(train_dataset.camera_intrinsics.focal)

variant_buckets = {}
for i in range(len(poses_np)):
    variant_buckets.setdefault(
        dominant_axis_for_pose(poses_np[i][:, :3]), []
    ).append(i)
bucket_variants = list(variant_buckets)
weights = np.array([len(variant_buckets[v]) for v in bucket_variants], np.float64)
weights /= weights.sum()

# final-stage LR of the parity recipe (lr schedule barely decays over 500 iters)
tx = optax.adam(LR)
opt_state = tx.init(grid)
picker = np.random.default_rng(7)
key = jax.random.PRNGKey(7)


def evaluate(g, label):
    for proc in ("render_sh_voxel_grid_fast", "render_sh_voxel_grid_bricked"):
        vm = VolumetricModel(g, render_procedure=proc,
                             render_config=base.render_config)
        r = test_sh_vox_grid_vol_mod_with_posed_images(vm, test_dataset)
        print(f"[{label}] {proc.split('_')[-1]}-eval: "
              f"{r['TEST_SET_PSNR']:.3f} dB")


evaluate(grid, "init")
for it in range(1, 501):
    key, step_key = jax.random.split(key)
    v = bucket_variants[int(picker.choice(len(bucket_variants), p=weights))]
    bucket = variant_buckets[v]
    statics = make_bricked_train_statics(
        grid, v[0], v[1], image_height=h, image_width=w, focal=focal,
        ray_batch_size=2048, white_bkgd=True, exit_eps=EXIT_EPS, tile_px=TILE_PX,
        axis_supersample=SSAA,
    )
    tile_pose_idx = jnp.asarray(picker.choice(bucket, size=statics.num_tiles),
                                jnp.int32)
    grid, opt_state, metrics = bricked_train_step(
        statics, tx, grid, opt_state, images, poses, tile_pose_idx, step_key
    )
    if it % 100 == 0:
        print(f"iter {it}: loss {float(metrics['total_loss']):.4f} "
              f"psnr {float(metrics['specular_psnr']):.2f}")
        evaluate(grid, f"iter{it}")
