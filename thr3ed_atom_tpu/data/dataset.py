"""Posed-images dataset, loaded straight into device arrays.

Parity: reference thre3d_atom/data/datasets.py:31-339. The reference's tiered caching
(GPU -> CPU -> lazy streaming, datasets.py:77-115) inverts on TPU: the whole dataset
(NeRF-synthetic at 800x800 x 100 images ~ 730 MB f32) fits HBM, so device residency is
the default and the jitted train step gathers ray batches directly from the resident
arrays — no DataLoader workers, no host->device transfer per step.

On-disk contract (shared with the reference): a directory of images + a JSON file mapping
image filename -> {intrinsic: {bounds, height, width, focal}, extrinsic: {rotation 3x3,
translation 3x1}}.
"""
from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Tuple

import numpy as np
from PIL import Image

from thr3ed_atom_tpu.utils.camera import (
    CameraBounds,
    CameraIntrinsics,
    CameraPose,
    adjust_dynamic_range,
)
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
from thr3ed_atom_tpu.utils.logging import log


class PosedImagesDataset:
    """Images + per-image camera poses, materialized as numpy (and on demand, device) arrays."""

    def __init__(
        self,
        images_dir: Path,
        camera_params_json: Path,
        image_data_range: Tuple[float, float] = (0.0, 1.0),
        normalize_scene_scale: bool = False,
        downsample_factor: float = 1.0,
        rgba_white_bkgd: bool = False,
    ) -> None:
        images_dir, camera_params_json = Path(images_dir), Path(camera_params_json)
        assert images_dir.exists(), f"Images dir doesn't exist: {images_dir}"
        assert camera_params_json.exists(), (
            f"CameraParams file doesn't exist: {camera_params_json}"
        )

        with open(camera_params_json) as f:
            self._camera_parameters: Dict[str, Any] = json.load(f)

        image_file_paths = sorted(p for p in images_dir.iterdir() if p.is_file())
        self._image_file_paths = self._filter_image_file_paths(
            image_file_paths, self._camera_parameters
        )

        self._images_dir = images_dir
        self._camera_params_json = camera_params_json
        self._image_data_range = image_data_range
        self._normalize_scene_scale_bool = normalize_scene_scale
        self._downsample_factor = downsample_factor
        self._rgba_white_bkgd = rgba_white_bkgd

        self._camera_bounds = self._setup_camera_bounds()
        self._camera_intrinsics = self._setup_camera_intrinsics()

        if normalize_scene_scale:
            self._normalize_scene_scale()

        # eager load: images [N, H, W, 3] float32, poses [N, 3, 4] float32
        self._images, self._poses = self._load_all()
        log.info(
            f"Loaded {len(self._images)} posed images at resolution "
            f"[{self._camera_intrinsics.height} x {self._camera_intrinsics.width}]"
        )

    # ------------------------------------------------------------------ properties

    @property
    def images(self) -> np.ndarray:
        return self._images

    @property
    def poses(self) -> np.ndarray:
        return self._poses

    @property
    def camera_bounds(self) -> CameraBounds:
        return self._camera_bounds

    @camera_bounds.setter
    def camera_bounds(self, camera_bounds: CameraBounds) -> None:
        self._camera_bounds = camera_bounds

    @property
    def camera_intrinsics(self) -> CameraIntrinsics:
        return self._camera_intrinsics

    @property
    def camera_parameters(self) -> Dict[str, Any]:
        return self._camera_parameters

    def get_config_dict(self) -> Dict[str, Any]:
        return {
            "images_dir": self._images_dir,
            "camera_params_json": self._camera_params_json,
            "image_data_range": self._image_data_range,
            "normalize_scene_scale": self._normalize_scene_scale_bool,
            "downsample_factor": self._downsample_factor,
            "rgba_white_bkgd": self._rgba_white_bkgd,
        }

    def __len__(self) -> int:
        return len(self._image_file_paths)

    def __getitem__(self, index: int) -> Tuple[np.ndarray, np.ndarray]:
        return self._images[index], self._poses[index]

    # ------------------------------------------------------------------ setup internals

    @staticmethod
    def _filter_image_file_paths(
        image_file_paths: List[Path], camera_parameters: Dict[str, Any]
    ) -> List[Path]:
        """Drop images that have no pose entry (reference datasets.py:148-161)."""
        if len(image_file_paths) == len(camera_parameters):
            return image_file_paths
        return [p for p in image_file_paths if p.name in camera_parameters]

    def _setup_camera_bounds(self) -> CameraBounds:
        all_bounds = np.vstack(
            [
                np.array(cp[INTRINSIC][BOUNDS], dtype=np.float32)
                for cp in self._camera_parameters.values()
            ]
        )
        # global near/far with 10% slack on both ends (reference datasets.py:235-245)
        return CameraBounds(float(all_bounds.min() * 0.9), float(all_bounds.max() * 1.1))

    def _setup_camera_intrinsics(self) -> CameraIntrinsics:
        all_intrinsics = np.vstack(
            [
                np.array(
                    [cp[INTRINSIC][HEIGHT], cp[INTRINSIC][WIDTH], cp[INTRINSIC][FOCAL]],
                    dtype=np.float32,
                )
                for cp in self._camera_parameters.values()
            ]
        )
        assert np.all(all_intrinsics == all_intrinsics[0, :]), (
            "all cameras must share identical intrinsics"
        )
        height, width, focal = all_intrinsics[0, :] / self._downsample_factor
        return CameraIntrinsics(int(height), int(width), float(focal))

    def _normalize_scene_scale(self) -> None:
        """Scale all camera translations (and bounds) by the farthest camera's norm
        (reference datasets.py:186-217)."""
        all_locations = np.concatenate(
            [
                self.extract_pose(cp).translation
                for cp in self._camera_parameters.values()
            ],
            axis=-1,
        )
        max_norm = float(np.max(np.linalg.norm(all_locations, axis=0)))
        for params in self._camera_parameters.values():
            translation = params[EXTRINSIC][TRANSLATION]
            for row in range(3):
                translation[row][0] = str(float(translation[row][0]) / max_norm)
        self._camera_bounds = CameraBounds(
            self._camera_bounds.near / max_norm, self._camera_bounds.far / max_norm
        )

    def get_hemispherical_radius_estimate(self) -> float:
        """Mean camera-location norm (reference datasets.py:219-232)."""
        all_locations = np.squeeze(
            np.array(
                [
                    cp[EXTRINSIC][TRANSLATION]
                    for cp in self._camera_parameters.values()
                ]
            ).astype(np.float32)
        )
        return float(np.linalg.norm(all_locations, axis=-1).mean())

    @staticmethod
    def extract_pose(camera_params: Dict[str, Any]) -> CameraPose:
        rotation = np.array(camera_params[EXTRINSIC][ROTATION]).astype(np.float32)
        translation = np.array(camera_params[EXTRINSIC][TRANSLATION]).astype(np.float32)
        return CameraPose(rotation, translation)

    # ------------------------------------------------------------------ image loading

    def _process_image(self, image: Image.Image) -> np.ndarray:
        """Resize + RGBA handling (reference datasets.py:266-284, data/utils.py:19-41):
        white-composite or premultiply alpha; >4 channel images keep first 3."""
        target = (self._camera_intrinsics.width, self._camera_intrinsics.height)
        if image.size != target:
            image = image.resize(target, Image.BILINEAR)
        arr = np.asarray(image, dtype=np.float32) / 255.0
        if arr.ndim == 2:
            arr = np.repeat(arr[..., None], 3, axis=-1)
        if arr.shape[-1] == 4:
            rgb, alpha = arr[..., :3], arr[..., 3:]
            if self._rgba_white_bkgd:
                arr = rgb * alpha + (1.0 - alpha)
            else:
                arr = rgb * alpha
        elif arr.shape[-1] > 4:
            arr = arr[..., :3]
        if self._image_data_range != (0.0, 1.0):
            arr = adjust_dynamic_range(
                arr, drange_in=(0.0, 1.0), drange_out=self._image_data_range
            )
        return arr

    def _load_all(self) -> Tuple[np.ndarray, np.ndarray]:
        images, poses = [], []
        for path in self._image_file_paths:
            with Image.open(path) as img:
                images.append(self._process_image(img))
            pose = self.extract_pose(self._camera_parameters[path.name])
            poses.append(np.hstack([pose.rotation, pose.translation]))
        return (
            np.stack(images).astype(np.float32),
            np.stack(poses).astype(np.float32),
        )
