"""Video writing with graceful backend fallback.

The reference writes .mp4 via imageio+ffmpeg (render CLI :112-116, model.py:211-215);
deployments without an ffmpeg backend (like this one) fall back to an animated GIF next
to the requested path, keeping the pipeline end-to-end runnable.
"""
from pathlib import Path

import numpy as np

from thr3ed_atom_tpu.utils.logging import log


def write_video(path, frames: np.ndarray, fps: float) -> Path:
    """Write [T, H, W, 3] uint8 frames; returns the path actually written."""
    import imageio.v2 as imageio

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    try:
        imageio.mimwrite(path, frames, fps=fps)
        return path
    except Exception as error:  # no ffmpeg backend -> GIF fallback
        gif_path = path.with_suffix(".gif")
        log.info(
            f"mp4 backend unavailable ({type(error).__name__}); writing {gif_path}"
        )
        imageio.mimwrite(gif_path, frames, duration=1000.0 / fps, loop=0)
        return gif_path
