"""Ray utilities: pinhole ray casting, collation, NDC reprojection, synchronized
ray/pixel subsampling.

Parity: reference thre3d_atom/rendering/volumetric/utils/misc.py:12-163. Ray casting is a
pure jittable function of (pose, intrinsics); the reference's full-``randperm`` ray
subsampling (misc.py:117-129) becomes a fixed-size ``jax.random`` index draw so shapes stay
static under jit.
"""
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from thr3ed_atom_tpu.rendering.interface import Rays, RenderOut
from thr3ed_atom_tpu.utils.camera import CameraIntrinsics, CameraPose
from thr3ed_atom_tpu.utils.constants import NUM_COORD_DIMENSIONS


def pose_to_jnp(pose: CameraPose) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CameraPose (numpy, jnp, or traced) -> (rotation [3, 3], translation [3, 1]) f32."""
    rotation = jnp.asarray(pose.rotation, dtype=jnp.float32)
    translation = jnp.asarray(pose.translation, dtype=jnp.float32)
    return rotation, translation.reshape(3, 1)


def cast_rays(camera_intrinsics: CameraIntrinsics, pose: CameraPose) -> Rays:
    """Pinhole rays through pixel centers; [H, W, 3] origins/directions, float32.

    Pixel centers at half-integer offsets (linspace(0.5, dim - 0.5)); camera-space
    directions [(x - W/2)/f, -(y - H/2)/f, -1] rotated into world space
    (reference misc.py:12-50).
    """
    rotation, translation = pose_to_jnp(pose)
    height, width, focal = camera_intrinsics

    x_coords = jnp.linspace(0.5, width - 0.5, width, dtype=jnp.float32)
    y_coords = jnp.linspace(0.5, height - 0.5, height, dtype=jnp.float32)
    x_grid, y_grid = jnp.meshgrid(x_coords, y_coords, indexing="xy")  # [H, W]

    dirs = jnp.stack(
        [
            (x_grid - width * 0.5) / focal,
            -(y_grid - height * 0.5) / focal,
            -jnp.ones_like(x_grid),
        ],
        axis=-1,
    )  # [H, W, 3]

    rays_d = jnp.einsum("ij,hwj->hwi", rotation, dirs,
                        precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(translation.reshape(-1), rays_d.shape)
    return Rays(origins=rays_o, directions=rays_d)


def cast_rays_batch(
    camera_intrinsics: CameraIntrinsics, poses: jnp.ndarray
) -> Rays:
    """Vectorized ray casting for a batch of [B, 3, 4] poses -> Rays [B, H, W, 3]."""
    def one(pose):
        return cast_rays(
            camera_intrinsics, CameraPose(rotation=pose[:, :3], translation=pose[:, 3:])
        )

    return jax.vmap(one)(poses)


def flatten_rays(rays: Rays) -> Rays:
    return Rays(
        origins=rays.origins.reshape(-1, NUM_COORD_DIMENSIONS),
        directions=rays.directions.reshape(-1, NUM_COORD_DIMENSIONS),
    )


def collate_rays(rays_list: Sequence[Rays]) -> Rays:
    return Rays(
        origins=jnp.concatenate([r.origins for r in rays_list], axis=0),
        directions=jnp.concatenate([r.directions for r in rays_list], axis=0),
    )


def compute_expected_density_scale_for_relu_field_grid(
    grid_world_size: Tuple[float, float, float]
) -> float:
    """Heuristic density scale for ReLU-field grids (reference misc.py:68-78)."""
    diagonal_norm = float(np.sqrt(np.sum([extent**2 for extent in grid_world_size])))
    percent_density_scale, constant_grid_norm = 100.0, float(np.sqrt(3.0**3))
    return ((constant_grid_norm * percent_density_scale) / diagonal_norm) / NUM_COORD_DIMENSIONS


def ndcize_rays(rays: Rays, camera_intrinsics: CameraIntrinsics) -> Rays:
    """Reproject rays into normalized device coordinates (reference misc.py:81-114)."""
    height, width, focal = camera_intrinsics
    near = 1.0
    rays_o, rays_d = rays.origins, rays.directions

    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (width / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (height / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = (
        -1.0
        / (width / (2.0 * focal))
        * (rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2])
    )
    d1 = (
        -1.0
        / (height / (2.0 * focal))
        * (rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2])
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return Rays(
        origins=jnp.stack([o0, o1, o2], axis=-1),
        directions=jnp.stack([d0, d1, d2], axis=-1),
    )


def sample_random_rays_and_pixels_synchronously(
    key: jax.Array,
    rays: Rays,
    pixels: jnp.ndarray,
    sample_size: int,
) -> Tuple[Rays, jnp.ndarray]:
    """Draw ``sample_size`` ray/pixel pairs without replacement (static output shape).

    TPU-native counterpart of the reference's full randperm-then-slice (misc.py:117-129):
    a fixed-size choice keeps the jit shape static regardless of the source pool size.
    """
    num_rays = pixels.shape[0]
    idx = jax.random.choice(key, num_rays, shape=(sample_size,), replace=False)
    return (
        Rays(origins=rays.origins[idx], directions=rays.directions[idx]),
        pixels[idx],
    )


def collate_rendered_output(rendered_chunks: Sequence[RenderOut]) -> RenderOut:
    """Concatenate per-chunk RenderOuts along the ray axis (misc.py:132-149)."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *rendered_chunks
    )


def reshape_rendered_output(
    rendered_output: RenderOut, camera_intrinsics: CameraIntrinsics
) -> RenderOut:
    """Flat [H*W, .] -> [H, W, .] (misc.py:152-163)."""
    new_shape = (camera_intrinsics.height, camera_intrinsics.width, -1)
    return jax.tree_util.tree_map(
        lambda x: x.reshape(*new_shape), rendered_output
    )
