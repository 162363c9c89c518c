"""Visualization-layer tests: the reference's interactive plt.show() checks
(test_voxels.py:88-134, test_volumetric_model.py:66-122) become assertable
file-producing smoke tests."""
import numpy as np
import pytest

import jax.numpy as jnp

from thr3ed_atom_tpu.models.voxels import VoxelGrid, VoxelSize
from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
from thr3ed_atom_tpu.utils.camera import (
    CameraBounds,
    CameraIntrinsics,
    CameraPose,
    pose_spherical,
)
from thr3ed_atom_tpu.visualizations.animations import (
    render_camera_path_for_volumetric_model,
)
from thr3ed_atom_tpu.visualizations.static import (
    process_rendered_output_for_feedback_log,
    visualize_sh_vox_grid_vol_mod_rendered_feedback,
)
from thr3ed_atom_tpu.visualizations.video import write_video


@pytest.fixture(scope="module")
def single_cube_vol_mod():
    """A single random 2x2x2 voxel cube (the reference's trilinear eyeball test)."""
    rng = np.random.default_rng(42)
    grid = VoxelGrid(
        densities=jnp.full((2, 2, 2, 1), 10.0),
        features=jnp.asarray(rng.uniform(-3, 3, (2, 2, 2, 3)).astype(np.float32)),
        voxel_size=VoxelSize(1.0, 1.0, 1.0),
    )
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=64,
        camera_bounds=CameraBounds(1.0, 5.0),
        perturb_sampled_points=False,
        white_bkgd=True,
        parallel_rays_chunk_size=4096,
    )
    return VolumetricModel(grid, render_config=config)


def test_single_cube_renders_from_all_six_faces(single_cube_vol_mod, tmp_path):
    """Render the cube from +-x, +-y, +-z; every face view must be finite, show the
    cube (acc > 0 in the middle), and distinct faces must differ (random colours)."""
    intr = CameraIntrinsics(32, 32, 40.0)
    face_poses = [
        pose_spherical(0.0, 0.0, 3.0),
        pose_spherical(90.0, 0.0, 3.0),
        pose_spherical(180.0, 0.0, 3.0),
        pose_spherical(270.0, 0.0, 3.0),
        pose_spherical(0.0, -90.0, 3.0),
        pose_spherical(0.0, 90.0, 3.0),
    ]
    images = []
    for pose in face_poses:
        out = single_cube_vol_mod.render(pose, intr)
        colour = np.asarray(out.colour)
        acc = np.asarray(out.extra["accumulated_weight"])
        assert np.isfinite(colour).all()
        assert acc[16, 16, 0] > 0.9  # cube fills the image center
        images.append(colour)
    images = np.stack(images)
    # at least two faces show different colours (random per-vertex features)
    assert np.abs(images[0] - images[2]).max() > 0.05


def test_feedback_panel_layout(single_cube_vol_mod):
    intr = CameraIntrinsics(24, 24, 30.0)
    out = single_cube_vol_mod.render(pose_spherical(30.0, -30.0, 3.0), intr)
    panel = process_rendered_output_for_feedback_log(out, training_time=123.0)
    # colour | depth | inverted acc side-by-side
    assert panel.shape == (24, 24 * 3, 3)
    assert panel.dtype == np.uint8


def test_feedback_files_written(single_cube_vol_mod, tmp_path):
    intr = CameraIntrinsics(16, 16, 20.0)
    visualize_sh_vox_grid_vol_mod_rendered_feedback(
        vol_mod=single_cube_vol_mod,
        render_feedback_pose=pose_spherical(10.0, -20.0, 3.0),
        camera_intrinsics=intr,
        global_step=7,
        feedback_logs_dir=tmp_path,
        overridden_num_samples_per_ray=32,
        log_diffuse_rendered_version=True,
        verbose_rendering=False,
    )
    assert (tmp_path / "specular_7.png").exists()
    assert (tmp_path / "diffuse_7.png").exists()


def test_camera_path_animation_and_video(single_cube_vol_mod, tmp_path):
    intr = CameraIntrinsics(16, 16, 20.0)
    path = [pose_spherical(yaw, -30.0, 3.0) for yaw in (0.0, 120.0, 240.0)]
    frames = render_camera_path_for_volumetric_model(
        single_cube_vol_mod, path, intr, verbose=False,
        overridden_num_samples_per_ray=32,
    )
    assert frames.shape == (3, 16, 48, 3)
    assert frames.dtype == np.uint8

    written = write_video(tmp_path / "video.mp4", frames, fps=10)
    assert written.exists()  # mp4 or the gif fallback


def test_camera_rays_plot(tmp_path):
    """visualize_camera_rays writes the 3D ray-bundle figure (static.py:29-79)."""
    import json

    from PIL import Image

    from thr3ed_atom_tpu.data.dataset import PosedImagesDataset
    from thr3ed_atom_tpu.utils.constants import (
        BOUNDS, EXTRINSIC, FOCAL, HEIGHT, INTRINSIC, ROTATION, TRANSLATION, WIDTH,
    )
    from thr3ed_atom_tpu.visualizations.static import visualize_camera_rays

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    params = {}
    for i in range(3):
        name = f"i_{i}.png"
        Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(img_dir / name)
        pose = pose_spherical(i * 120.0, -30.0, 4.0)
        params[name] = {
            INTRINSIC: {BOUNDS: [2, 6], HEIGHT: 8, WIDTH: 8, FOCAL: 10.0},
            EXTRINSIC: {ROTATION: pose.rotation.tolist(),
                        TRANSLATION: pose.translation.tolist()},
        }
    with open(tmp_path / "cp.json", "w") as f:
        json.dump(params, f)
    ds = PosedImagesDataset(images_dir=img_dir, camera_params_json=tmp_path / "cp.json")
    visualize_camera_rays(ds, tmp_path, num_rays_per_image=2)
    assert (tmp_path / "casted_camera_rays.png").exists()
