"""VolumetricModel facade tests: full-image render, chunking invariance, config
overrides, save/load round trip."""
import numpy as np
import pytest

import jax.numpy as jnp

from thr3ed_atom_tpu.models.voxels import VoxelGrid, VoxelSize
from thr3ed_atom_tpu.modules.volumetric_model import (
    VolumetricModel,
    create_volumetric_model_from_saved_model,
)
from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
from thr3ed_atom_tpu.utils.camera import CameraBounds, CameraIntrinsics, pose_spherical


@pytest.fixture(scope="module")
def vol_mod():
    rng = np.random.default_rng(0)
    G = 8
    coords = (
        np.stack(np.meshgrid(*[np.arange(G)] * 3, indexing="ij"), -1) - (G - 1) / 2
    ) / G
    densities = np.where(np.linalg.norm(coords, axis=-1) < 0.35, 6.0, 0.0)[..., None]
    grid = VoxelGrid(
        densities=jnp.asarray(densities.astype(np.float32)),
        features=jnp.asarray(rng.standard_normal((G, G, G, 12)).astype(np.float32)),
        voxel_size=VoxelSize(3 / G, 3 / G, 3 / G),
    )
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=32,
        camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True,
        parallel_rays_chunk_size=512,
    )
    return VolumetricModel(grid, render_config=config)


def test_full_image_render_shapes(vol_mod):
    intr = CameraIntrinsics(24, 32, 30.0)
    out = vol_mod.render(pose_spherical(0.0, -30.0, 4.0), intr)
    assert out.colour.shape == (24, 32, 3)
    assert out.depth.shape == (24, 32, 1)
    assert out.extra["accumulated_weight"].shape == (24, 32, 1)
    assert np.isfinite(np.asarray(out.colour)).all()


def test_chunking_invariance(vol_mod):
    """The same image must come out regardless of the ray chunk size."""
    intr = CameraIntrinsics(16, 16, 20.0)
    pose = pose_spherical(45.0, -45.0, 4.0)
    full = vol_mod.render(pose, intr, parallel_rays_chunk_size=16 * 16)
    chunked = vol_mod.render(pose, intr, parallel_rays_chunk_size=60)  # non-divisor
    np.testing.assert_allclose(
        np.asarray(full.colour), np.asarray(chunked.colour), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(full.depth), np.asarray(chunked.depth), atol=1e-4
    )


def test_render_rays_config_override(vol_mod):
    from thr3ed_atom_tpu.rendering.interface import Rays

    rays = Rays(
        origins=jnp.tile(jnp.array([[0.0, 0.0, 4.0]]), (8, 1)),
        directions=jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (8, 1)),
    )
    base = vol_mod.render_rays(rays, perturb_sampled_points=False)
    diffuse = vol_mod.render_rays(
        rays, perturb_sampled_points=False, render_diffuse=True
    )
    assert base.colour.shape == diffuse.colour.shape
    # diffuse drops view dependence -> different values with random features
    assert not np.allclose(np.asarray(base.colour), np.asarray(diffuse.colour))
    # the stored config is untouched by per-call overrides
    assert vol_mod.render_config.render_diffuse is False


def test_save_load_roundtrip(vol_mod, tmp_path):
    path = tmp_path / "model"
    vol_mod.save(path, extra_info={"hemispherical_radius": 4.0})
    loaded, extra = create_volumetric_model_from_saved_model(path)
    assert extra["hemispherical_radius"] == 4.0
    assert loaded.render_config == vol_mod.render_config
    assert loaded.thre3d_repr.voxel_size == vol_mod.thre3d_repr.voxel_size
    np.testing.assert_array_equal(
        np.asarray(loaded.thre3d_repr.features), np.asarray(vol_mod.thre3d_repr.features)
    )

    # renders identically after the round trip
    intr = CameraIntrinsics(8, 8, 10.0)
    pose = pose_spherical(10.0, -20.0, 4.0)
    np.testing.assert_allclose(
        np.asarray(vol_mod.render(pose, intr).colour),
        np.asarray(loaded.render(pose, intr).colour),
        atol=1e-6,
    )


def test_unknown_render_procedure_rejected(vol_mod):
    with pytest.raises(AssertionError):
        VolumetricModel(vol_mod.thre3d_repr, render_procedure="nonexistent")
