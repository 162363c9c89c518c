"""Dense SH-feature voxel grid as a JAX pytree.

TPU-first re-design of the reference's torch ``VoxelGrid`` module (reference
thre3d_atom/thre3d_reprs/voxels.py:46-331): the trainable arrays (``densities``
[W, D, H, 1] and ``features`` [W, D, H, F]) are pytree leaves optimized directly by optax
under jit; everything else (voxel size, grid location, activation names, density scale) is
static metadata hashed into the jit cache key. Activations are registry strings — never
pickled callables — so checkpoints are plain arrays + JSON.

Conventions preserved from the reference:
  * axes: x = width (+right), y = depth (+inwards), z = height (+up) (voxels.py:116-121)
  * AABB = grid_dims * voxel_size centered at grid_location (voxels.py:187-212)
  * world -> [-1, 1] normalization uses the un-clipped affine map (slack=True)
    (voxels.py:214-223)
  * interpolation follows torch grid_sample(align_corners=False, padding_mode='zeros')
    with the z,y,x permute convention (voxels.py:295-321) — see ops/grid_sample.py
  * density preactivation applies to ``densities * expected_density_scale`` on the whole
    grid BEFORE interpolation; postactivation after (voxels.py:292-309)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from thr3ed_atom_tpu.ops.grid_sample import trilinear_grid_sample
from thr3ed_atom_tpu.utils.camera import adjust_dynamic_range


class VoxelSize(NamedTuple):
    """Edge lengths of a single voxel along x, y, z (anisotropic voxels allowed)."""

    x_size: float = 1.0
    y_size: float = 1.0
    z_size: float = 1.0


class VoxelGridLocation(NamedTuple):
    """World-coordinate location of the grid's center; the grid is axis aligned."""

    x_coord: float = 0.0
    y_coord: float = 0.0
    z_coord: float = 0.0


class AxisAlignedBoundingBox(NamedTuple):
    x_range: Tuple[float, float]
    y_range: Tuple[float, float]
    z_range: Tuple[float, float]


# registry of activation functions by name — checkpoints store the name, never the function
ACTIVATIONS: Dict[str, Callable[[jnp.ndarray], jnp.ndarray]] = {
    "identity": lambda x: x,
    "abs": jnp.abs,
    "relu": jax.nn.relu,
    "softplus": jax.nn.softplus,
    "sigmoid": jax.nn.sigmoid,
}

# registry of radiance transfer functions by name (reference voxels.py:62,325-328): maps
# (interpolated features [N, F], viewdirs [N, 3]) -> radiance-space features. ``None``
# (the default) returns raw features; the SH evaluation then happens in the point
# processor.
RADIANCE_TRANSFER_FUNCTIONS: Dict[str, Callable] = {}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VoxelGrid:
    # trainable pytree leaves:
    densities: jnp.ndarray = dataclasses.field(metadata=dict(static=False))
    features: jnp.ndarray = dataclasses.field(metadata=dict(static=False))
    # static metadata (part of the jit cache key):
    voxel_size: VoxelSize = dataclasses.field(
        default=VoxelSize(), metadata=dict(static=True)
    )
    grid_location: VoxelGridLocation = dataclasses.field(
        default=VoxelGridLocation(), metadata=dict(static=True)
    )
    density_preactivation: str = dataclasses.field(
        default="abs", metadata=dict(static=True)
    )
    density_postactivation: str = dataclasses.field(
        default="identity", metadata=dict(static=True)
    )
    feature_preactivation: str = dataclasses.field(
        default="identity", metadata=dict(static=True)
    )
    feature_postactivation: str = dataclasses.field(
        default="identity", metadata=dict(static=True)
    )
    expected_density_scale: float = dataclasses.field(
        default=1.0, metadata=dict(static=True)
    )
    # name in RADIANCE_TRANSFER_FUNCTIONS, or None for raw SH features
    radiance_transfer_function: Optional[str] = dataclasses.field(
        default=None, metadata=dict(static=True)
    )

    # ------------------------------------------------------------------ properties

    @property
    def grid_dims(self) -> Tuple[int, int, int]:
        return tuple(self.features.shape[:3])

    @property
    def width_x(self) -> int:
        return self.features.shape[0]

    @property
    def depth_y(self) -> int:
        return self.features.shape[1]

    @property
    def height_z(self) -> int:
        return self.features.shape[2]

    @property
    def num_features(self) -> int:
        return self.features.shape[-1]

    @property
    def aabb(self) -> AxisAlignedBoundingBox:
        half_width = (self.width_x * self.voxel_size.x_size) / 2
        half_depth = (self.depth_y * self.voxel_size.y_size) / 2
        half_height = (self.height_z * self.voxel_size.z_size) / 2
        return AxisAlignedBoundingBox(
            x_range=(
                self.grid_location.x_coord - half_width,
                self.grid_location.x_coord + half_width,
            ),
            y_range=(
                self.grid_location.y_coord - half_depth,
                self.grid_location.y_coord + half_depth,
            ),
            z_range=(
                self.grid_location.z_coord - half_height,
                self.grid_location.z_coord + half_height,
            ),
        )

    # ------------------------------------------------------------------ geometry

    def normalize_points(self, points: jnp.ndarray) -> jnp.ndarray:
        """World coordinates -> [-1, 1]^3 grid coordinates (un-clipped affine map)."""
        aabb = self.aabb
        axes = []
        for axis, axis_range in enumerate(aabb):
            axes.append(
                adjust_dynamic_range(
                    points[..., axis], drange_in=axis_range, drange_out=(-1.0, 1.0), slack=True
                )
            )
        return jnp.stack(axes, axis=-1)

    def test_inside_volume(self, points: jnp.ndarray) -> jnp.ndarray:
        """Strict-inequality AABB membership test; [..., 3] -> [..., 1] bool."""
        aabb = self.aabb
        inside = (
            (points[..., 0:1] > aabb.x_range[0])
            & (points[..., 0:1] < aabb.x_range[1])
            & (points[..., 1:2] > aabb.y_range[0])
            & (points[..., 1:2] < aabb.y_range[1])
            & (points[..., 2:3] > aabb.z_range[0])
            & (points[..., 2:3] < aabb.z_range[1])
        )
        return inside

    def get_bounding_volume_vertices(self) -> jnp.ndarray:
        (x_min, x_max), (y_min, y_max), (z_min, z_max) = self.aabb
        return jnp.array(
            [
                [x_min, y_min, z_min],
                [x_min, y_min, z_max],
                [x_min, y_max, z_min],
                [x_min, y_max, z_max],
                [x_max, y_min, z_min],
                [x_max, y_min, z_max],
                [x_max, y_max, z_min],
                [x_max, y_max, z_max],
            ],
            dtype=jnp.float32,
        )

    # ------------------------------------------------------------------ sampling

    def activated_grids(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Pre-activated (density, feature) grids ready for interpolation."""
        density_pre = ACTIVATIONS[self.density_preactivation]
        feature_pre = ACTIVATIONS[self.feature_preactivation]
        pre_densities = density_pre(self.densities * self.expected_density_scale)
        if self.feature_preactivation == "identity":
            pre_features = self.features  # avoid materializing a copy of the big grid
        else:
            pre_features = feature_pre(self.features)
        return pre_densities, pre_features

    def __call__(
        self, points: jnp.ndarray, viewdirs: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """Interpolated [N, F + 1] (features ++ density) at world-space ``points`` [N, 3]."""
        normalized_points = self.normalize_points(points)

        pre_densities, pre_features = self.activated_grids()
        # one fused gather over the concatenated channels: 8 taps total instead of 16
        unified = jnp.concatenate([pre_features, pre_densities], axis=-1)
        interpolated = trilinear_grid_sample(unified, normalized_points)
        interp_features, interp_densities = interpolated[..., :-1], interpolated[..., -1:]

        interp_densities = ACTIVATIONS[self.density_postactivation](interp_densities)
        interp_features = ACTIVATIONS[self.feature_postactivation](interp_features)

        if self.radiance_transfer_function is not None and viewdirs is not None:
            interp_features = RADIANCE_TRANSFER_FUNCTIONS[
                self.radiance_transfer_function
            ](interp_features, viewdirs)

        return jnp.concatenate([interp_features, interp_densities], axis=-1)

    # ------------------------------------------------------------------ config / io

    def get_config_dict(self) -> Dict[str, Any]:
        return {
            "grid_location": tuple(self.grid_location),
            "density_preactivation": self.density_preactivation,
            "density_postactivation": self.density_postactivation,
            "feature_preactivation": self.feature_preactivation,
            "feature_postactivation": self.feature_postactivation,
            "expected_density_scale": self.expected_density_scale,
            "radiance_transfer_function": self.radiance_transfer_function,
        }

    def get_save_config_dict(self) -> Dict[str, Any]:
        config = self.get_config_dict()
        config["voxel_size"] = tuple(self.voxel_size)
        return config


def create_voxel_grid(
    key: jax.Array,
    grid_dims: Tuple[int, int, int],
    num_features: int,
    voxel_size: VoxelSize,
    minval: float = -1.0,
    maxval: float = 1.0,
    dtype=jnp.float32,
    **config,
) -> VoxelGrid:
    """Uniform(-1, 1)-initialized grid (parity: reference train CLI :202-206)."""
    key_d, key_f = jax.random.split(key)
    densities = jax.random.uniform(
        key_d, (*grid_dims, 1), minval=minval, maxval=maxval, dtype=dtype
    )
    features = jax.random.uniform(
        key_f, (*grid_dims, num_features), minval=minval, maxval=maxval, dtype=dtype
    )
    return VoxelGrid(
        densities=densities, features=features, voxel_size=voxel_size, **config
    )


def scale_voxel_grid_with_required_output_size(
    voxel_grid: VoxelGrid, output_size: Tuple[int, int, int], mode: str = "trilinear"
) -> VoxelGrid:
    """Trilinear resize of the (features ++ densities) grid to ``output_size``; voxel size
    rescales so the world-space AABB is preserved (reference voxels.py:334-373).

    ``jax.image.resize(method='trilinear')`` uses half-pixel sample positions, matching
    torch ``interpolate(align_corners=False)``.
    """
    assert mode == "trilinear", "only trilinear grid scaling is supported"
    unified = jnp.concatenate([voxel_grid.features, voxel_grid.densities], axis=-1)
    new_unified = jax.image.resize(
        unified, (*output_size, unified.shape[-1]), method="trilinear"
    )
    old_size = voxel_grid.voxel_size
    new_voxel_size = VoxelSize(
        (old_size.x_size * voxel_grid.width_x) / output_size[0],
        (old_size.y_size * voxel_grid.depth_y) / output_size[1],
        (old_size.z_size * voxel_grid.height_z) / output_size[2],
    )
    return dataclasses.replace(
        voxel_grid,
        densities=new_unified[..., -1:],
        features=new_unified[..., :-1],
        voxel_size=new_voxel_size,
    )


def create_voxel_grid_from_saved_info_dict(saved_info: Dict[str, Any]) -> VoxelGrid:
    """Rebuild a VoxelGrid from a checkpoint dict of arrays + config (no pickle);
    counterpart of reference voxels.py:376-383."""
    from thr3ed_atom_tpu.utils.constants import CONFIG_DICT, STATE_DICT, THRE3D_REPR

    state = saved_info[THRE3D_REPR][STATE_DICT]
    config = dict(saved_info[THRE3D_REPR][CONFIG_DICT])
    voxel_size = VoxelSize(*config.pop("voxel_size"))
    grid_location = VoxelGridLocation(*config.pop("grid_location"))
    return VoxelGrid(
        densities=jnp.asarray(state["densities"]),
        features=jnp.asarray(state["features"]),
        voxel_size=voxel_size,
        grid_location=grid_location,
        **config,
    )
