"""Data-layer tests: on-disk contract, camera bounds/intrinsics derivation, RGBA
handling, pose filtering, scene-scale normalization, and the NeRF-blender converter."""
import json

import numpy as np
import pytest
from PIL import Image

from thr3ed_atom_tpu.data.dataset import PosedImagesDataset
from thr3ed_atom_tpu.utils.camera import pose_spherical
from thr3ed_atom_tpu.utils.constants import (
    BOUNDS,
    EXTRINSIC,
    FOCAL,
    HEIGHT,
    INTRINSIC,
    ROTATION,
    TRANSLATION,
    WIDTH,
)


def _write_scene(tmp_path, num_images=5, size=32, rgba=False, radius=4.0,
                 extra_image_without_pose=False):
    img_dir = tmp_path / "images"
    img_dir.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    params = {}
    for i in range(num_images):
        name = f"img_{i}.png"
        channels = 4 if rgba else 3
        arr = (rng.uniform(0, 255, (size, size, channels))).astype(np.uint8)
        if rgba:
            arr[..., 3] = 128  # half-transparent everywhere
        Image.fromarray(arr, "RGBA" if rgba else "RGB").save(img_dir / name)
        pose = pose_spherical(i * 60.0, -30.0, radius)
        params[name] = {
            INTRINSIC: {BOUNDS: [2.0, 6.0], HEIGHT: size, WIDTH: size, FOCAL: size * 1.1},
            EXTRINSIC: {
                ROTATION: pose.rotation.tolist(),
                TRANSLATION: pose.translation.tolist(),
            },
        }
    if extra_image_without_pose:
        Image.fromarray(np.zeros((size, size, 3), np.uint8)).save(img_dir / "orphan.png")
    json_path = tmp_path / "camera_params.json"
    with open(json_path, "w") as f:
        json.dump(params, f)
    return img_dir, json_path


def test_basic_loading_and_shapes(tmp_path):
    img_dir, json_path = _write_scene(tmp_path, num_images=4, size=32)
    ds = PosedImagesDataset(images_dir=img_dir, camera_params_json=json_path)
    assert len(ds) == 4
    assert ds.images.shape == (4, 32, 32, 3)
    assert ds.poses.shape == (4, 3, 4)
    assert ds.images.dtype == np.float32
    assert 0.0 <= ds.images.min() and ds.images.max() <= 1.0
    image, pose = ds[1]
    assert image.shape == (32, 32, 3) and pose.shape == (3, 4)
    # rotation is orthonormal
    np.testing.assert_allclose(pose[:, :3] @ pose[:, :3].T, np.eye(3), atol=1e-5)


def test_camera_bounds_slack(tmp_path):
    img_dir, json_path = _write_scene(tmp_path)
    ds = PosedImagesDataset(images_dir=img_dir, camera_params_json=json_path)
    # global min*0.9 / max*1.1 (reference datasets.py:235-245)
    assert ds.camera_bounds.near == pytest.approx(2.0 * 0.9)
    assert ds.camera_bounds.far == pytest.approx(6.0 * 1.1)


def test_downsample_factor(tmp_path):
    img_dir, json_path = _write_scene(tmp_path, size=32)
    ds = PosedImagesDataset(
        images_dir=img_dir, camera_params_json=json_path, downsample_factor=2.0
    )
    assert ds.camera_intrinsics.height == 16
    assert ds.camera_intrinsics.width == 16
    assert ds.camera_intrinsics.focal == pytest.approx(32 * 1.1 / 2)
    assert ds.images.shape[1:3] == (16, 16)


def test_hemispherical_radius_estimate(tmp_path):
    img_dir, json_path = _write_scene(tmp_path, radius=4.0)
    ds = PosedImagesDataset(images_dir=img_dir, camera_params_json=json_path)
    # all cameras on a radius-4 sphere -> mean norm == 4 (datasets.py:219-232)
    assert ds.get_hemispherical_radius_estimate() == pytest.approx(4.0, abs=1e-4)


def test_rgba_white_bkgd_compositing(tmp_path):
    img_dir, json_path = _write_scene(tmp_path, rgba=True)
    white = PosedImagesDataset(
        images_dir=img_dir, camera_params_json=json_path, rgba_white_bkgd=True
    )
    premult = PosedImagesDataset(
        images_dir=img_dir, camera_params_json=json_path, rgba_white_bkgd=False
    )
    # alpha = 0.5: white-composited is premultiplied + 0.5
    np.testing.assert_allclose(
        white.images, premult.images + (1 - 128 / 255), atol=2e-2
    )


def test_filters_images_without_poses(tmp_path):
    img_dir, json_path = _write_scene(tmp_path, num_images=3, extra_image_without_pose=True)
    ds = PosedImagesDataset(images_dir=img_dir, camera_params_json=json_path)
    assert len(ds) == 3  # the orphan image is dropped (datasets.py:148-161)


def test_normalize_scene_scale(tmp_path):
    img_dir, json_path = _write_scene(tmp_path, radius=4.0)
    ds = PosedImagesDataset(
        images_dir=img_dir, camera_params_json=json_path, normalize_scene_scale=True
    )
    # farthest camera lands on the unit sphere; bounds scale along
    assert ds.get_hemispherical_radius_estimate() == pytest.approx(1.0, abs=1e-4)
    assert ds.camera_bounds.near == pytest.approx(2.0 * 0.9 / 4.0, rel=1e-4)


def test_nerf_blender_converter(tmp_path):
    """The converter produces the dataset's on-disk contract from transforms_*.json."""
    import subprocess
    import sys

    scene = tmp_path / "nerf_scene"
    for split in ("train", "val", "test"):
        (scene / split).mkdir(parents=True)
        frames = []
        for i in range(2):
            name = f"r_{i}"
            Image.fromarray(np.zeros((20, 20, 3), np.uint8)).save(
                scene / split / f"{name}.png"
            )
            transform = np.eye(4)
            transform[2, 3] = 4.0
            frames.append(
                {"file_path": f"./{split}/{name}", "transform_matrix": transform.tolist()}
            )
        with open(scene / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.69, "frames": frames}, f)

    out = tmp_path / "converted"
    result = subprocess.run(
        [sys.executable, "tools/convert_from_nerf_blender_dataset.py",
         "-d", str(scene), "-o", str(out)],
        capture_output=True, text=True, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu", "HOME": "/root"},
    )
    assert result.returncode == 0, result.stderr
    with open(out / "train_camera_params.json") as f:
        params = json.load(f)
    assert "r_0.png" in params
    entry = params["r_0.png"]
    assert entry[INTRINSIC][BOUNDS] == [2.0, 6.0]
    assert entry[INTRINSIC][HEIGHT] == 20
    expected_focal = 0.5 * 20 / np.tan(0.5 * 0.69)
    assert entry[INTRINSIC][FOCAL] == pytest.approx(expected_focal)
    np.testing.assert_allclose(np.array(entry[EXTRINSIC][TRANSLATION]), [[0], [0], [4.0]])

    # and the produced directory loads as a dataset
    ds = PosedImagesDataset(
        images_dir=scene / "train", camera_params_json=out / "train_camera_params.json"
    )
    assert len(ds) == 2
