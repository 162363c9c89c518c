"""Static visualizations: camera-ray plots and training feedback panels.

Parity: reference thre3d_atom/visualizations/static.py:29-172.
"""
from datetime import timedelta
from pathlib import Path
from typing import Optional

import numpy as np

from thr3ed_atom_tpu.data.dataset import PosedImagesDataset
from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
from thr3ed_atom_tpu.rendering.interface import RenderOut
import jax.numpy as jnp

from thr3ed_atom_tpu.rendering.interface import Rays
from thr3ed_atom_tpu.rendering.rays import ndcize_rays
from thr3ed_atom_tpu.utils.camera import (
    CameraIntrinsics,
    CameraPose,
    postprocess_depth_map,
    to8b,
)
from thr3ed_atom_tpu.utils.constants import (
    EXTRA_ACCUMULATED_WEIGHTS,
    NUM_COLOUR_CHANNELS,
)
from thr3ed_atom_tpu.utils.logging import log


def visualize_camera_rays(
    dataset: PosedImagesDataset,
    output_dir: Path,
    num_rays_per_image: int = 30,
    do_ndcize_rays: bool = False,
) -> None:
    """3D matplotlib plot of per-image ray bundles -> casted_camera_rays.png
    (reference static.py:29-79)."""
    from matplotlib import pyplot as plt

    fig = plt.figure()
    fig.suptitle("Camera rays visualization")
    ax = fig.add_subplot(111, projection="3d")
    all_camera_locations = []

    height, width, focal = dataset.camera_intrinsics
    for camera_param in dataset.camera_parameters.values():
        pose = dataset.extract_pose(camera_param)
        # sample the pixels FIRST, then compute only those rays host-side in
        # numpy (same pinhole math as rendering/rays.py:cast_rays). Casting
        # the full [H, W] bundle on-device and pulling it back costs ~4 MB of
        # host<->device traffic per image through the ~225 MB/s tunnel for a
        # plot that keeps num_rays_per_image of them.
        pix = np.random.randint(0, height * width, size=num_rays_per_image)
        px = (pix % width).astype(np.float32) + 0.5
        py = (pix // width).astype(np.float32) + 0.5
        cam_dirs = np.stack(
            [
                (px - width * 0.5) / focal,
                -(py - height * 0.5) / focal,
                -np.ones_like(px),
            ],
            axis=-1,
        )
        rotation = np.asarray(pose.rotation, np.float32).reshape(3, 3)
        translation = np.asarray(pose.translation, np.float32).reshape(3)
        directions = cam_dirs @ rotation.T
        origins = np.broadcast_to(translation, directions.shape).copy()
        if do_ndcize_rays:
            rays = ndcize_rays(
                Rays(origins=jnp.asarray(origins),
                     directions=jnp.asarray(directions)),
                dataset.camera_intrinsics,
            )
            origins = np.asarray(rays.origins)
            directions = np.asarray(rays.directions)
        all_camera_locations.append(origins[0])

        far_plane = dataset.camera_bounds.far if not do_ndcize_rays else 1.0
        ends = origins + directions * far_plane
        for point_a, point_b in zip(origins, ends):
            seg = np.stack([point_a, point_b])
            ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], color="b")

    all_camera_locations = np.stack(all_camera_locations, axis=0)
    ax.scatter(
        all_camera_locations[:, 0],
        all_camera_locations[:, 1],
        all_camera_locations[:, 2],
        color="m",
    )
    plt.tight_layout()
    plt.savefig(Path(output_dir) / "casted_camera_rays.png", dpi=600)
    plt.close(fig)


def process_rendered_output_for_feedback_log(
    rendered_output: RenderOut,
    training_time: Optional[float] = None,
) -> np.ndarray:
    """Side-by-side colour | magma depth | inverted acc panel with an optional
    training-time stamp (reference static.py:82-111)."""
    from PIL import Image, ImageDraw

    colour_map = to8b(np.asarray(rendered_output.colour))
    acc = np.asarray(rendered_output.extra[EXTRA_ACCUMULATED_WEIGHTS])
    depth_map = postprocess_depth_map(
        np.asarray(rendered_output.depth).squeeze(), acc_map=acc
    )
    acc_map = np.tile(to8b(1.0 - acc), (1, 1, NUM_COLOUR_CHANNELS))

    feedback_image = np.concatenate([colour_map, depth_map, acc_map], axis=1)

    if training_time is not None:
        pil_image = Image.fromarray(feedback_image)
        ImageDraw.Draw(pil_image).text(
            (10, 10), str(timedelta(seconds=training_time)), (0, 0, 0)
        )
        feedback_image = np.array(pil_image)
    return feedback_image


def visualize_sh_vox_grid_vol_mod_rendered_feedback(
    vol_mod: VolumetricModel,
    render_feedback_pose: CameraPose,
    camera_intrinsics: CameraIntrinsics,
    global_step: int,
    feedback_logs_dir: Path,
    parallel_rays_chunk_size: Optional[int] = None,
    training_time: Optional[float] = None,
    log_diffuse_rendered_version: bool = True,
    use_optimized_sampling_mode: bool = False,
    overridden_num_samples_per_ray: Optional[int] = None,
    verbose_rendering: bool = True,
) -> None:
    """Specular (and optionally diffuse) full renders at high spp -> numbered PNGs
    (reference static.py:114-172)."""
    import imageio.v2 as imageio

    num_samples = (
        overridden_num_samples_per_ray
        if overridden_num_samples_per_ray is not None
        else 1024
    )

    log.info("rendering intermediate output for feedback")
    specular = vol_mod.render(
        camera_pose=render_feedback_pose,
        camera_intrinsics=camera_intrinsics,
        parallel_rays_chunk_size=parallel_rays_chunk_size,
        verbose=verbose_rendering,
        optimized_sampling=use_optimized_sampling_mode,
        num_samples_per_ray=num_samples,
    )
    imageio.imwrite(
        Path(feedback_logs_dir) / f"specular_{global_step}.png",
        process_rendered_output_for_feedback_log(specular, training_time),
    )

    if log_diffuse_rendered_version:
        diffuse = vol_mod.render(
            camera_pose=render_feedback_pose,
            camera_intrinsics=camera_intrinsics,
            parallel_rays_chunk_size=parallel_rays_chunk_size,
            verbose=verbose_rendering,
            optimized_sampling=use_optimized_sampling_mode,
            render_diffuse=True,
            num_samples_per_ray=num_samples,
        )
        imageio.imwrite(
            Path(feedback_logs_dir) / f"diffuse_{global_step}.png",
            process_rendered_output_for_feedback_log(diffuse, training_time),
        )
