"""VoxelGrid pytree tests: AABB geometry, activations, grid scaling vs torch oracle,
pytree/jit behaviour."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from thr3ed_atom_tpu.models.voxels import (
    VoxelGrid,
    VoxelGridLocation,
    VoxelSize,
    create_voxel_grid,
    scale_voxel_grid_with_required_output_size,
)


def _random_grid(key, dims=(4, 5, 6), features=12, **kwargs):
    return create_voxel_grid(
        key, grid_dims=dims, num_features=features, voxel_size=VoxelSize(0.5, 0.5, 0.5),
        **kwargs,
    )


def test_aabb_centered(key):
    grid = _random_grid(key, dims=(4, 6, 8))
    aabb = grid.aabb
    assert aabb.x_range == (-1.0, 1.0)
    assert aabb.y_range == (-1.5, 1.5)
    assert aabb.z_range == (-2.0, 2.0)


def test_aabb_offset_location(key):
    grid = dataclasses.replace(
        _random_grid(key, dims=(4, 4, 4)), grid_location=VoxelGridLocation(1.0, 2.0, 3.0)
    )
    aabb = grid.aabb
    assert aabb.x_range == (0.0, 2.0)
    assert aabb.y_range == (1.0, 3.0)
    assert aabb.z_range == (2.0, 4.0)


def test_inside_volume_strict(key):
    grid = _random_grid(key, dims=(4, 4, 4))  # AABB [-1, 1]^3
    points = jnp.array(
        [[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.999, 0.0, 0.0], [-1.2, 0.0, 0.0]]
    )
    inside = np.asarray(grid.test_inside_volume(points)).ravel()
    np.testing.assert_array_equal(inside, [True, False, True, False])


def test_is_pytree_with_two_leaves(key):
    grid = _random_grid(key)
    leaves = jax.tree_util.tree_leaves(grid)
    assert len(leaves) == 2
    # static metadata must survive a tree_map round trip
    mapped = jax.tree_util.tree_map(lambda x: x * 2, grid)
    assert mapped.voxel_size == grid.voxel_size
    assert mapped.density_preactivation == grid.density_preactivation


def test_forward_applies_activations(key):
    grid = _random_grid(key, dims=(4, 4, 4), features=3)
    relu_grid = dataclasses.replace(
        grid,
        density_preactivation="identity",
        density_postactivation="relu",
        expected_density_scale=10.0,
    )
    points = jnp.zeros((16, 3))
    out = np.asarray(relu_grid(points))
    assert out.shape == (16, 4)
    assert (out[:, -1] >= 0.0).all()  # relu'd densities

    abs_grid = dataclasses.replace(
        grid, density_preactivation="abs", density_postactivation="identity"
    )
    out_abs = np.asarray(abs_grid(points))
    assert (out_abs[:, -1] >= 0.0).all()  # abs-preactivated then interpolated


def test_scale_voxel_grid_matches_torch_interpolate(key):
    grid = _random_grid(key, dims=(6, 6, 6), features=4)
    scaled = scale_voxel_grid_with_required_output_size(grid, (12, 12, 12))

    unified = np.concatenate(
        [np.asarray(grid.features), np.asarray(grid.densities)], axis=-1
    )
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(unified).permute(3, 0, 1, 2)[None],
        size=(12, 12, 12),
        mode="trilinear",
        align_corners=False,
    )[0].permute(1, 2, 3, 0).numpy()

    ours = np.concatenate(
        [np.asarray(scaled.features), np.asarray(scaled.densities)], axis=-1
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)
    # world extent is preserved
    assert scaled.voxel_size.x_size == pytest.approx(grid.voxel_size.x_size / 2)
    assert scaled.aabb == grid.aabb


def test_scale_voxel_grid_downscale(key):
    grid = _random_grid(key, dims=(8, 8, 8), features=2)
    scaled = scale_voxel_grid_with_required_output_size(grid, (4, 4, 4))
    assert scaled.grid_dims == (4, 4, 4)
    assert scaled.aabb == grid.aabb
