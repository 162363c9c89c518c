"""Parity tests for the trilinear grid sampler against torch.grid_sample (CPU oracle).

The reference's exact hot-path semantics are torch grid_sample(align_corners=False,
padding_mode='zeros') applied to the permute(0, 4, 3, 2, 1)'d [W, D, H, C] volume
(reference thre3d_atom/thre3d_reprs/voxels.py:295-321). These tests pin our JAX
implementation to that oracle, including out-of-bounds and boundary behaviour.
"""
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from thr3ed_atom_tpu.ops.grid_sample import trilinear_grid_sample


def _torch_reference(volume: np.ndarray, coords: np.ndarray) -> np.ndarray:
    """The reference's grid_sample invocation, verbatim semantics."""
    vol_t = torch.from_numpy(volume)[None, ...].permute(0, 4, 3, 2, 1)  # [1, C, H, D, W]
    grid_t = torch.from_numpy(coords)[None, None, None, ...]  # [1, 1, 1, N, 3]
    out = torch.nn.functional.grid_sample(vol_t, grid_t, align_corners=False)
    return out.permute(0, 2, 3, 4, 1).reshape(-1, volume.shape[-1]).numpy()


@pytest.mark.parametrize("shape", [(4, 4, 4, 1), (8, 6, 5, 3), (3, 3, 3, 28)])
def test_matches_torch_inside_volume(shape):
    rng = np.random.default_rng(0)
    volume = rng.standard_normal(shape).astype(np.float32)
    coords = rng.uniform(-0.95, 0.95, size=(256, 3)).astype(np.float32)

    ours = np.asarray(trilinear_grid_sample(jnp.asarray(volume), jnp.asarray(coords)))
    theirs = _torch_reference(volume, coords)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_matches_torch_out_of_bounds_zero_padding():
    rng = np.random.default_rng(1)
    volume = rng.standard_normal((5, 5, 5, 2)).astype(np.float32)
    # include far-out-of-range and boundary-straddling points
    coords = rng.uniform(-1.8, 1.8, size=(512, 3)).astype(np.float32)

    ours = np.asarray(trilinear_grid_sample(jnp.asarray(volume), jnp.asarray(coords)))
    theirs = _torch_reference(volume, coords)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_matches_torch_exact_boundary():
    rng = np.random.default_rng(2)
    volume = rng.standard_normal((4, 4, 4, 1)).astype(np.float32)
    # exact +-1 coordinates sit half a voxel outside the edge centers (align_corners=False)
    vals = np.array([-1.0, 1.0, 0.0], dtype=np.float32)
    coords = np.stack(np.meshgrid(vals, vals, vals, indexing="ij"), -1).reshape(-1, 3)

    ours = np.asarray(trilinear_grid_sample(jnp.asarray(volume), jnp.asarray(coords)))
    theirs = _torch_reference(volume, coords)
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_grid_vertex_lookup_closed_form():
    """With align_corners=False, voxel center i sits at normalized (2i + 1)/size - 1;
    sampling there must return the vertex value exactly."""
    rng = np.random.default_rng(3)
    W, D, H = 4, 5, 6
    volume = rng.standard_normal((W, D, H, 2)).astype(np.float32)

    idx = np.stack(
        np.meshgrid(np.arange(W), np.arange(D), np.arange(H), indexing="ij"), -1
    ).reshape(-1, 3)
    sizes = np.array([W, D, H], dtype=np.float32)
    coords = ((2.0 * idx + 1.0) / sizes) - 1.0

    ours = np.asarray(
        trilinear_grid_sample(jnp.asarray(volume), jnp.asarray(coords.astype(np.float32)))
    )
    np.testing.assert_allclose(ours, volume.reshape(-1, 2), atol=1e-5)


def test_midpoint_interpolation_closed_form():
    """Midpoint between two adjacent voxel centers averages their values."""
    volume = np.zeros((2, 1, 1, 1), dtype=np.float32)
    volume[0, 0, 0, 0] = 1.0
    volume[1, 0, 0, 0] = 3.0
    # x midpoint between centers of voxels 0 and 1 is normalized x = 0; y, z at centers
    coords = np.array([[0.0, 0.0, 0.0]], dtype=np.float32)
    ours = np.asarray(trilinear_grid_sample(jnp.asarray(volume), jnp.asarray(coords)))
    np.testing.assert_allclose(ours, [[2.0]], atol=1e-6)
