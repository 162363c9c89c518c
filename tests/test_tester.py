"""Heldout-evaluation module tests (C18): PSNR averaging over a synthetic test set and
TensorBoard scalar emission."""
import json

import numpy as np
from PIL import Image

import jax.numpy as jnp

from thr3ed_atom_tpu.data.dataset import PosedImagesDataset
from thr3ed_atom_tpu.models.voxels import VoxelGrid, VoxelSize
from thr3ed_atom_tpu.modules.tester import (  # noqa: F401
    TEST_SET_LPIPS,
    TEST_SET_LPIPS_RAND,
    TEST_SET_PSNR,
    test_sh_vox_grid_vol_mod_with_posed_images as evaluate_heldout,  # avoid pytest collection
)
from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
from thr3ed_atom_tpu.utils.camera import CameraBounds, CameraIntrinsics, pose_spherical, to8b
from thr3ed_atom_tpu.utils.constants import (
    BOUNDS, EXTRINSIC, FOCAL, HEIGHT, INTRINSIC, ROTATION, TRANSLATION, WIDTH,
)


class _Recorder:
    def __init__(self):
        self.scalars = {}

    def add_scalar(self, name, value, global_step=None):
        self.scalars[name] = (value, global_step)


def test_evaluation_on_self_rendered_images(tmp_path):
    """Evaluating a model against its OWN renders must give a very high PSNR."""
    G = 8
    rng = np.random.default_rng(0)
    coords = (
        np.stack(np.meshgrid(*[np.arange(G)] * 3, indexing="ij"), -1) - (G - 1) / 2
    ) / G
    densities = np.where(np.linalg.norm(coords, axis=-1) < 0.35, 6.0, 0.0)[..., None]
    grid = VoxelGrid(
        densities=jnp.asarray(densities.astype(np.float32)),
        features=jnp.asarray(rng.standard_normal((G, G, G, 3)).astype(np.float32)),
        voxel_size=VoxelSize(3 / G, 3 / G, 3 / G),
    )
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=32,
        camera_bounds=CameraBounds(2.0, 6.0),
        perturb_sampled_points=False,
        white_bkgd=True,
        render_num_samples_per_ray=32,  # eval renders with the same spp -> exact match
    )
    vol_mod = VolumetricModel(grid, render_config=config)

    size = 24
    intr = CameraIntrinsics(size, size, size * 1.2)
    img_dir = tmp_path / "test"
    img_dir.mkdir()
    params = {}
    for i in range(2):
        pose = pose_spherical(i * 137.0, -33.0, 4.0)
        out = vol_mod.render(pose, intr)
        name = f"t_{i}.png"
        Image.fromarray(to8b(np.asarray(out.colour))).save(img_dir / name)
        params[name] = {
            INTRINSIC: {BOUNDS: [2.0, 6.0], HEIGHT: size, WIDTH: size,
                        FOCAL: size * 1.2},
            EXTRINSIC: {ROTATION: pose.rotation.tolist(),
                        TRANSLATION: pose.translation.tolist()},
        }
    with open(tmp_path / "test_camera_params.json", "w") as f:
        json.dump(params, f)

    dataset = PosedImagesDataset(
        images_dir=img_dir, camera_params_json=tmp_path / "test_camera_params.json"
    )
    recorder = _Recorder()
    results = evaluate_heldout(
        vol_mod, dataset, tensorboard_writer=recorder, global_step=42
    )
    # limited only by the 8-bit PNG quantization
    assert results[TEST_SET_PSNR] > 45.0
    assert recorder.scalars[TEST_SET_PSNR][1] == 42
    # LPIPS is ALWAYS computed (pure-JAX metric); the uncalibrated random-feature
    # fallback reports under its own key so dashboards never compare it against
    # calibrated values. Near-identical images score ~0 either way.
    lpips_key = TEST_SET_LPIPS if TEST_SET_LPIPS in results else TEST_SET_LPIPS_RAND
    assert lpips_key in results
    assert 0.0 <= results[lpips_key] < 1e-3
    assert recorder.scalars[lpips_key][1] == 42
