"""Parity tests: cell-packed sampling == reference grid sampler; fast two-phase
renderer == exact renderer (at K = S exactly; at K << S to high tolerance)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thr3ed_atom_tpu.models.voxels import VoxelGrid, VoxelSize
from thr3ed_atom_tpu.ops.grid_sample import trilinear_grid_sample
from thr3ed_atom_tpu.ops.packed_grid import pack_grid_cells, packed_trilinear_sample
from thr3ed_atom_tpu.rendering.fast_renderer import render_sh_voxel_grid_fast
from thr3ed_atom_tpu.rendering.rays import cast_rays, flatten_rays
from thr3ed_atom_tpu.rendering.renderer import (
    SHVoxGridRenderConfig,
    render_sh_voxel_grid,
)
from thr3ed_atom_tpu.utils.camera import CameraBounds, CameraIntrinsics, pose_spherical


@pytest.mark.parametrize("shape", [(4, 5, 6, 3), (8, 8, 8, 28)])
def test_packed_sampling_matches_reference_sampler(shape):
    rng = np.random.default_rng(0)
    volume = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    coords = jnp.asarray(rng.uniform(-1.6, 1.6, (512, 3)).astype(np.float32))

    exact = trilinear_grid_sample(volume, coords)
    packed = pack_grid_cells(volume)
    fast = packed_trilinear_sample(packed, coords, shape[:3])
    np.testing.assert_allclose(np.asarray(fast), np.asarray(exact), atol=1e-5)


def _scene(num_features=27):
    G = 16
    rng = np.random.default_rng(3)
    coords = (
        np.stack(np.meshgrid(*[np.arange(G)] * 3, indexing="ij"), -1) - (G - 1) / 2
    ) / G
    dist = np.linalg.norm(coords, axis=-1)
    densities = np.where(dist < 0.3, 6.0, 0.0)[..., None].astype(np.float32)
    features = rng.standard_normal((G, G, G, num_features)).astype(np.float32)
    return VoxelGrid(
        densities=jnp.asarray(densities),
        features=jnp.asarray(features),
        voxel_size=VoxelSize(3 / G, 3 / G, 3 / G),
        density_preactivation="identity",
        density_postactivation="relu",
        expected_density_scale=2.0,
    )


def _rays(n=17):
    intr = CameraIntrinsics(n, n, n * 1.2)
    return flatten_rays(cast_rays(intr, pose_spherical(33.0, -35.0, 4.0)))


@pytest.mark.parametrize("render_diffuse", [False, True])
@pytest.mark.parametrize("white_bkgd", [False, True])
def test_fast_matches_exact_at_full_k(render_diffuse, white_bkgd):
    """With K == S the two-phase renderer is algebraically identical to the exact one."""
    grid = _scene()
    rays = _rays()
    S = 48
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=S,
        camera_bounds=CameraBounds(2.0, 6.0),
        perturb_sampled_points=False,
        white_bkgd=white_bkgd,
        render_diffuse=render_diffuse,
        fast_topk=S,
    )
    exact = render_sh_voxel_grid(grid, rays, config, None)
    fast = render_sh_voxel_grid_fast(grid, rays, config, None)
    np.testing.assert_allclose(
        np.asarray(fast.colour), np.asarray(exact.colour), atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(fast.depth), np.asarray(exact.depth), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(fast.extra["accumulated_weight"]),
        np.asarray(exact.extra["accumulated_weight"]),
        atol=1e-5,
    )


@pytest.mark.parametrize("k,tol", [(16, 0.05), (32, 1e-4)])
def test_fast_with_small_k_is_close(k, tol):
    """Dropped colour mass shrinks rapidly with K (measured: K=32 of 96 is already at
    float precision on a soft-edged scene; K=16 errs only on boundary rays)."""
    grid = _scene()
    rays = _rays()
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=96,
        camera_bounds=CameraBounds(2.0, 6.0),
        perturb_sampled_points=False,
        white_bkgd=True,
        fast_topk=k,
    )
    exact = render_sh_voxel_grid(grid, rays, config, None)
    fast = render_sh_voxel_grid_fast(grid, rays, config, None)
    err = np.abs(np.asarray(fast.colour) - np.asarray(exact.colour)).max()
    assert err < tol, f"top-{k} colour deviates too much: {err}"
    # depth and acc are exact regardless of K
    np.testing.assert_allclose(
        np.asarray(fast.depth), np.asarray(exact.depth), atol=1e-4
    )


def test_fast_optimized_sampling_and_perturb(key):
    """The AABB sampler + stratified jitter paths run and stay finite."""
    grid = _scene()
    rays = _rays(9)
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=32,
        camera_bounds=CameraBounds(2.0, 6.0),
        perturb_sampled_points=True,
        optimized_sampling=True,
        white_bkgd=True,
        fast_topk=16,
    )
    out = jax.jit(
        lambda g, r, k: render_sh_voxel_grid_fast(g, r, config, k)
    )(grid, rays, key)
    assert np.isfinite(np.asarray(out.colour)).all()
    assert np.isfinite(np.asarray(out.extra["disparity"])).all()


def test_fast_gradients_flow(key):
    grid = _scene(num_features=3)
    rays = _rays(7)
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=32,
        camera_bounds=CameraBounds(2.0, 6.0),
        perturb_sampled_points=False,
        white_bkgd=True,
        fast_topk=8,
    )

    def loss(g):
        out = render_sh_voxel_grid_fast(g, rays, config, None)
        return jnp.mean((out.colour - 0.25) ** 2)

    grads = jax.grad(loss)(grid)
    assert float(jnp.abs(grads.densities).sum()) > 0.0
    assert float(jnp.abs(grads.features).sum()) > 0.0
    assert np.isfinite(np.asarray(grads.densities)).all()


def test_fast_grad_matches_exact_grad_at_full_k():
    """Same math => same gradients (K = S, deterministic config)."""
    grid = _scene(num_features=3)
    rays = _rays(5)
    S = 24
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=S,
        camera_bounds=CameraBounds(2.0, 6.0),
        perturb_sampled_points=False,
        white_bkgd=True,
        fast_topk=S,
    )

    def loss(renderer, g):
        out = renderer(g, rays, config, None)
        return jnp.mean(jnp.abs(out.colour - 0.5))

    g_exact = jax.grad(lambda g: loss(render_sh_voxel_grid, g))(grid)
    g_fast = jax.grad(lambda g: loss(render_sh_voxel_grid_fast, g))(grid)
    np.testing.assert_allclose(
        np.asarray(g_fast.densities), np.asarray(g_exact.densities), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_fast.features), np.asarray(g_exact.features), atol=1e-5
    )



def test_bf16_feature_tables_close():
    """fast_bf16_features halves phase-2 bytes with ~1e-3 colour error."""
    grid = _scene()
    rays = _rays(9)
    base = SHVoxGridRenderConfig(
        num_samples_per_ray=64, camera_bounds=CameraBounds(2.0, 6.0),
        perturb_sampled_points=False, white_bkgd=True, fast_topk=32,
    )
    f32 = render_sh_voxel_grid_fast(grid, rays, base, None)
    bf16 = render_sh_voxel_grid_fast(
        grid, rays, base.replace(fast_bf16_features=True), None
    )
    err = np.abs(np.asarray(f32.colour) - np.asarray(bf16.colour)).max()
    assert err < 5e-3, err
    # depth/acc are computed from the f32 density table either way -> exact
    np.testing.assert_allclose(np.asarray(f32.depth), np.asarray(bf16.depth), atol=1e-6)


@pytest.mark.parametrize("pre,post,scale", [
    ("identity", "relu", 10.0),      # relu-field
    ("identity", "softplus", 10.0),  # softplus-field
    ("abs", "identity", 1.0),        # traditional grid
])
def test_density_activation_modes_match_exact(pre, post, scale):
    """All three CLI activation modes agree between the exact and fast procedures."""
    import dataclasses as dc

    grid = dc.replace(
        _scene(),
        density_preactivation=pre,
        density_postactivation=post,
        expected_density_scale=scale,
    )
    rays = _rays(9)
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=48, camera_bounds=CameraBounds(2.0, 6.0),
        perturb_sampled_points=False, white_bkgd=True, fast_topk=48,
    )
    exact = render_sh_voxel_grid(grid, rays, config, None)
    fast = render_sh_voxel_grid_fast(grid, rays, config, None)
    np.testing.assert_allclose(
        np.asarray(fast.colour), np.asarray(exact.colour), atol=3e-5
    )


def test_fused_diffuse_matches_separate_render():
    """extra['diffuse_colour'] from one pass == a dedicated diffuse render over the
    same (deterministic) samples."""
    grid = _scene()
    rays = _rays(11)
    base = SHVoxGridRenderConfig(
        num_samples_per_ray=48, camera_bounds=CameraBounds(2.0, 6.0),
        perturb_sampled_points=False, white_bkgd=True, fast_topk=48,
    )
    fused = render_sh_voxel_grid_fast(
        grid, rays, base.replace(also_render_diffuse=True), None
    )
    separate = render_sh_voxel_grid_fast(
        grid, rays, base.replace(render_diffuse=True), None
    )
    np.testing.assert_allclose(
        np.asarray(fused.extra["diffuse_colour"]),
        np.asarray(separate.colour),
        atol=1e-5,
    )
    # the specular output is untouched by the flag
    plain = render_sh_voxel_grid_fast(grid, rays, base, None)
    np.testing.assert_array_equal(
        np.asarray(fused.colour), np.asarray(plain.colour)
    )


def test_unpacked_features_mode_matches_exact():
    """fast_pack_features=False (huge-grid mode) is exact at K = S."""
    grid = _scene()
    rays = _rays(11)
    S = 48
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=S, camera_bounds=CameraBounds(2.0, 6.0),
        perturb_sampled_points=False, white_bkgd=True, fast_topk=S,
        fast_pack_features=False,
    )
    exact = render_sh_voxel_grid(grid, rays, config, None)
    fast = render_sh_voxel_grid_fast(grid, rays, config, None)
    np.testing.assert_allclose(
        np.asarray(fast.colour), np.asarray(exact.colour), atol=2e-5
    )

    # gradients flow in this mode too
    def loss(g):
        return jnp.mean(render_sh_voxel_grid_fast(g, rays, config, None).colour ** 2)

    grads = jax.grad(loss)(grid)
    assert float(jnp.abs(grads.features).sum()) > 0.0


@pytest.mark.parametrize("procedure_name", [
    "render_sh_voxel_grid",
    "render_sh_voxel_grid_fast",
])
def test_renderer_grads_against_finite_differences(procedure_name):
    """jax.test_util.check_grads: the analytic VJP matches numerical differentiation
    (SURVEY.md §7 test prescription). Tiny smooth config: softplus density keeps the
    loss C1 so finite differences are well-posed."""
    from jax.test_util import check_grads

    from thr3ed_atom_tpu.rendering.renderer import RENDER_PROCEDURES

    procedure = RENDER_PROCEDURES[procedure_name]
    rng = np.random.default_rng(9)
    G = 6
    grid = VoxelGrid(
        densities=jnp.asarray(rng.uniform(0.5, 1.5, (G, G, G, 1)).astype(np.float32)),
        features=jnp.asarray(rng.standard_normal((G, G, G, 3)).astype(np.float32)),
        voxel_size=VoxelSize(3 / G, 3 / G, 3 / G),
        density_preactivation="identity",
        density_postactivation="softplus",
        expected_density_scale=2.0,
    )
    rays = _rays(4)
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=16,
        camera_bounds=CameraBounds(2.0, 6.0),
        perturb_sampled_points=False,
        white_bkgd=True,
        fast_topk=16,
    )

    def f(densities, features):
        g = VoxelGrid(
            densities=densities, features=features,
            voxel_size=grid.voxel_size,
            density_preactivation="identity",
            density_postactivation="softplus",
            expected_density_scale=2.0,
        )
        return jnp.sum(procedure(g, rays, config, None).colour ** 2)

    check_grads(f, (grid.densities, grid.features), order=1, modes=("rev",),
                atol=5e-2, rtol=5e-2)
