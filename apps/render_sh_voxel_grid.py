"""Offline render CLI: load a trained model, render a thre360/spiral camera path, write
a video.

Same flag surface as the reference's
thre3d_elements/relu_fields/render_sh_based_voxel_grid.py:28-116.
"""
import sys
from pathlib import Path

import click

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from thr3ed_atom_tpu.modules.volumetric_model import (  # noqa: E402
    create_volumetric_model_from_saved_model,
)
from thr3ed_atom_tpu.utils.camera import (  # noqa: E402
    CameraIntrinsics,
    get_thre360_animation_poses,
    get_thre360_spiral_animation_poses,
)
from thr3ed_atom_tpu.utils.constants import (  # noqa: E402
    CAMERA_INTRINSICS,
    HEMISPHERICAL_RADIUS,
)
from thr3ed_atom_tpu.visualizations.animations import (  # noqa: E402
    render_camera_path_for_volumetric_model,
)


# fmt: off
@click.command()
# Required arguments:
@click.option("-i", "--model_path", type=click.Path(dir_okay=False),
              required=True, help="path to the trained (reconstructed) model (.npz/.json pair)")
@click.option("-o", "--output_path", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="path for saving rendered output")
# Render configuration options:
@click.option("--overridden_num_samples_per_ray", type=click.IntRange(min=1), default=512,
              help="overridden (increased) num_samples_per_ray for high-quality renders")
@click.option("--render_scale_factor", type=click.FLOAT, default=2.0,
              help="resolution scale factor for the render")
@click.option("--camera_path", type=click.Choice(["thre360", "spiral"]), default="thre360",
              help="which camera path to use for rendering the animation")
# thre360 path options:
@click.option("--camera_pitch", type=click.FLOAT, default=60.0,
              help="pitch-angle value for the camera for 360 path animation")
@click.option("--num_frames", type=click.IntRange(min=1), default=180,
              help="number of frames in the video")
# spiral path options:
@click.option("--vertical_camera_height", type=click.FLOAT, default=3.0,
              help="height at which the camera spiralling happens")
@click.option("--num_spiral_rounds", type=click.IntRange(min=1), default=2,
              help="number of rounds made while transitioning between spiral radii")
# Video options:
@click.option("--fps", type=click.IntRange(min=1), default=60,
              help="frames per second of the video")
# fmt: on
def main(**config) -> None:
    from thr3ed_atom_tpu.visualizations.video import write_video

    model_path = Path(config["model_path"])
    output_path = Path(config["output_path"])
    output_path.mkdir(exist_ok=True, parents=True)

    vol_mod, extra_info = create_volumetric_model_from_saved_model(model_path)
    hemispherical_radius = extra_info[HEMISPHERICAL_RADIUS]
    height, width, focal = extra_info[CAMERA_INTRINSICS]
    camera_intrinsics = CameraIntrinsics(int(height), int(width), float(focal))

    if config["camera_path"] == "thre360":
        animation_poses = get_thre360_animation_poses(
            hemispherical_radius=hemispherical_radius,
            camera_pitch=config["camera_pitch"],
            num_poses=config["num_frames"],
        )
    else:
        animation_poses = get_thre360_spiral_animation_poses(
            horizontal_radius_range=(hemispherical_radius / 8.0, hemispherical_radius),
            vertical_camera_height=config["vertical_camera_height"],
            num_rounds=config["num_spiral_rounds"],
            num_poses=config["num_frames"],
        )

    animation_frames = render_camera_path_for_volumetric_model(
        vol_mod=vol_mod,
        camera_path=animation_poses,
        camera_intrinsics=camera_intrinsics,
        overridden_num_samples_per_ray=config["overridden_num_samples_per_ray"],
        render_scale_factor=config["render_scale_factor"],
    )

    write_video(output_path / "rendered_video.mp4", animation_frames, fps=config["fps"])


if __name__ == "__main__":
    main()
