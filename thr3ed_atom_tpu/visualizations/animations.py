"""Camera-path animation renderer (parity: reference
thre3d_atom/visualizations/animations.py:17-64)."""
from typing import Optional, Sequence

import numpy as np

from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
from thr3ed_atom_tpu.utils.camera import (
    CameraIntrinsics,
    CameraPose,
    postprocess_depth_map,
    scale_camera_intrinsics,
    to8b,
)
from thr3ed_atom_tpu.utils.constants import (
    EXTRA_ACCUMULATED_WEIGHTS,
    NUM_COLOUR_CHANNELS,
)
from thr3ed_atom_tpu.utils.logging import log


def render_camera_path_for_volumetric_model(
    vol_mod: VolumetricModel,
    camera_path: Sequence[CameraPose],
    camera_intrinsics: CameraIntrinsics,
    render_scale_factor: Optional[float] = None,
    overridden_num_samples_per_ray: Optional[int] = None,
    verbose: bool = True,
) -> np.ndarray:
    """Per pose: deterministic full render -> colour | depth | inverted-acc panel;
    returns a stacked [T, H, W*3, 3] uint8 video array."""
    if render_scale_factor is not None:
        camera_intrinsics = scale_camera_intrinsics(
            camera_intrinsics, render_scale_factor
        )

    overrides = {}
    if overridden_num_samples_per_ray is not None:
        overrides["num_samples_per_ray"] = overridden_num_samples_per_ray

    # batched multi-pose rendering: pose-structured procedures dispatch each
    # march-variant group once (rendering/gnomonic.py render_poses_gnomonic)
    # instead of paying the ~4.3 ms/pose tunnel dispatch floor per frame
    if verbose:
        log.info(f"rendering camera path ({len(camera_path)} frames, batched)")
    rendered = vol_mod.render_poses(
        list(camera_path), camera_intrinsics, **overrides
    )
    colour = np.asarray(rendered.colour)
    acc = np.asarray(rendered.extra[EXTRA_ACCUMULATED_WEIGHTS])
    depth = np.asarray(rendered.depth)

    rendered_frames = []
    for frame_num in range(len(camera_path)):
        colour_frame = to8b(colour[frame_num])
        depth_frame = postprocess_depth_map(
            depth[frame_num], acc_map=acc[frame_num]
        )
        acc_frame = to8b(
            1.0 - np.tile(acc[frame_num], (1, 1, NUM_COLOUR_CHANNELS))
        )
        frame = np.concatenate([colour_frame, depth_frame, acc_frame], axis=1)
        rendered_frames.append(frame)

    return np.stack(rendered_frames)
