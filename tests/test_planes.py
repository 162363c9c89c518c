"""Plane-march renderer: numerics vs an exact-oracle trapezoid composite.

The kernel interpolates the field at positions k/P along the march axis (exact
in-plane bilinear = trilinear restricted to the position plane) and composites
the cells between consecutive positions with the analytic relu-trapezoid
transmittance.  The oracle evaluates the EXACT f32 trilinear interpolant
(models.voxels.VoxelGrid.__call__, pinned against torch grid_sample) at the same
positions and applies the same closed-form cell integral — forward parity pins
tables, DMA patches, tent weights, SH fold, and the trapezoid compositing up to
bf16 grid/weight precision.  Runs the kernel in interpreter mode on CPU.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thr3ed_atom_tpu.models.voxels import VoxelGrid, VoxelSize, create_voxel_grid
from thr3ed_atom_tpu.ops.pallas.plane_march import _relu_trap
from thr3ed_atom_tpu.ops.sh import evaluate_spherical_harmonics
from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose
from thr3ed_atom_tpu.rendering.planes import render_image_planes
from thr3ed_atom_tpu.rendering.rays import cast_rays
from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
from thr3ed_atom_tpu.utils.camera import (
    CameraBounds,
    CameraIntrinsics,
    pose_spherical,
)
from thr3ed_atom_tpu.utils.constants import (
    EXTRA_ACCUMULATED_WEIGHTS,
    EXTRA_BRICKED_TAP_OVERFLOW,
    EXTRA_DIFFUSE_COLOUR,
)

GRID = 16
IMG = 32


def _make_grid(key, sparse=False, post="identity"):
    grid = create_voxel_grid(
        key,
        grid_dims=(GRID, GRID, GRID),
        num_features=27,
        voxel_size=VoxelSize(3.0 / GRID, 3.0 / GRID, 3.0 / GRID),
        density_preactivation="abs" if post == "identity" else "identity",
        density_postactivation=post,
        expected_density_scale=20.0,
    )
    if sparse:
        coords = jnp.stack(
            jnp.meshgrid(*[jnp.arange(GRID)] * 3, indexing="ij"), axis=-1
        )
        dist = jnp.linalg.norm(coords - (GRID - 1) / 2.0, axis=-1, keepdims=True)
        mask = (dist < GRID / 5.0).astype(jnp.float32)
        grid = dataclasses.replace(grid, densities=grid.densities * mask)
    return grid


def _oracle_render(grid: VoxelGrid, pose, intrinsics, pos_per_cell,
                   white_bkgd=False, relu_sigma=False):
    """Exact f32 trapezoid composite at the plane-march positions."""
    axis, flip = dominant_axis_for_pose(pose.rotation)
    dims = grid.grid_dims
    aabb = grid.aabb
    lo_a, hi_a = aabb[axis]
    n_a = dims[axis]
    cell = (hi_a - lo_a) / n_a
    P = pos_per_cell
    num_pos = (n_a - 1) * P + 1

    rays = cast_rays(intrinsics, pose)
    o = rays.origins.reshape(-1, 3)
    d = rays.directions.reshape(-1, 3)

    j = jnp.arange(num_pos, dtype=jnp.float32)
    t_cont = (num_pos - 1 - j) / P if flip else j / P
    w_k = lo_a + (t_cont + 0.5) * cell
    s = (w_k[None, :] - o[:, axis:axis + 1]) / d[:, axis:axis + 1]  # [N, NP]

    pts = o[:, None, :] + d[:, None, :] * s[..., None]
    inside = grid.test_inside_volume(pts.reshape(-1, 3))[:, 0].reshape(s.shape)
    valid = inside & (s > 0.0)
    step = s[:, 1:2] - s[:, 0:1]
    valid = valid & (step > 0.0)

    # RAW pre-postactivation interpolation: densities pre-activated, relu (if
    # any) applied by the trapezoid integral like the kernel
    pre_d, pre_f = grid.activated_grids()
    unified = jnp.concatenate([pre_f, pre_d], axis=-1)
    from thr3ed_atom_tpu.ops.grid_sample import trilinear_grid_sample

    vals = trilinear_grid_sample(unified, grid.normalize_points(pts.reshape(-1, 3)))
    feats, sigma = vals[:, :-1], vals[:, -1]
    sigma = sigma.reshape(s.shape)

    viewdirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    sh = feats.reshape(*s.shape, 3, 9)
    raw_rgb = evaluate_spherical_harmonics(2, sh, viewdirs[:, None, :])
    raw_dif = evaluate_spherical_harmonics(0, sh[..., :1], viewdirs[:, None, :])

    a_s, b_s = sigma[:, :-1], sigma[:, 1:]
    integ, tbar, _, _ = _relu_trap(a_s, b_s, relu_sigma)
    tbar = jax.lax.stop_gradient(tbar)
    cell_live = valid[:, :-1] & valid[:, 1:]
    integ = jnp.where(cell_live, integ, 0.0)
    delta = jnp.abs(step) * jnp.linalg.norm(d, axis=-1, keepdims=True)
    alpha = jnp.clip(1.0 - jnp.exp(-integ * delta), 0.0, 1.0)

    tb = tbar[..., None]
    mid = jax.nn.sigmoid((1.0 - tb) * raw_rgb[:, :-1] + tb * raw_rgb[:, 1:])
    dmid = jax.nn.sigmoid((1.0 - tb) * raw_dif[:, :-1] + tb * raw_dif[:, 1:])
    s_dep = s[:, :-1] + (s[:, 1:] - s[:, :-1]) * tbar

    trans = jnp.cumprod(1.0 - alpha, axis=-1)
    excl = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
    w = alpha * excl
    colour = jnp.sum(mid * w[..., None], axis=1)
    diffuse = jnp.sum(dmid * w[..., None], axis=1)
    acc = jnp.sum(w, axis=1, keepdims=True)
    depth = jnp.sum(s_dep * w, axis=1, keepdims=True)
    if white_bkgd:
        colour = colour + (1.0 - acc)
        diffuse = diffuse + (1.0 - acc)
    hw = (intrinsics.height, intrinsics.width)
    return (
        colour.reshape(*hw, 3),
        depth.reshape(*hw, 1),
        acc.reshape(*hw, 1),
        diffuse.reshape(*hw, 3),
    )


def _config(**kw):
    defaults = dict(
        num_samples_per_ray=32,
        camera_bounds=CameraBounds(1.0, 8.0),
        perturb_sampled_points=False,
        bricked_occupancy_alpha_thresh=0.0,
        bricked_exit_eps=0.0,
        white_bkgd=False,
        planes_pos_per_cell=2,
    )
    defaults.update(kw)
    return SHVoxGridRenderConfig(**defaults)


@pytest.mark.parametrize("yaw,pitch", [(30.0, -35.0), (120.0, -10.0), (260.0, -60.0)])
@pytest.mark.parametrize("pos_per_cell", [1, 2])
def test_planes_matches_exact_oracle(key, yaw, pitch, pos_per_cell):
    grid = _make_grid(key)
    pose = pose_spherical(yaw, pitch, 4.0)
    intrinsics = CameraIntrinsics(IMG, IMG, IMG * 1.1)

    out = render_image_planes(
        grid, pose, intrinsics, _config(planes_pos_per_cell=pos_per_cell),
        interpret=True,
    )
    colour, depth, acc, _ = _oracle_render(grid, pose, intrinsics, pos_per_cell)

    assert not bool(out.extra[EXTRA_BRICKED_TAP_OVERFLOW])
    np.testing.assert_allclose(np.asarray(out.colour), np.asarray(colour), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(out.extra[EXTRA_ACCUMULATED_WEIGHTS]), np.asarray(acc), atol=2e-2
    )
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(depth), atol=0.1)
    assert float(jnp.max(acc)) > 0.5


def test_planes_relu_field_white_bkgd_and_diffuse(key):
    """ReLU-field grid (identity pre, relu post — the production activation):
    the in-kernel relu trapezoid must match the oracle's closed form."""
    grid = _make_grid(key, post="relu")
    pose = pose_spherical(75.0, -25.0, 4.0)
    intrinsics = CameraIntrinsics(IMG, IMG, IMG * 1.1)

    out = render_image_planes(
        grid, pose, intrinsics,
        _config(white_bkgd=True, also_render_diffuse=True), interpret=True,
    )
    colour, _, acc, diffuse = _oracle_render(
        grid, pose, intrinsics, 2, white_bkgd=True, relu_sigma=True
    )
    np.testing.assert_allclose(np.asarray(out.colour), np.asarray(colour), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(out.extra[EXTRA_DIFFUSE_COLOUR]), np.asarray(diffuse), atol=2e-2
    )
    assert float(jnp.max(acc)) > 0.5


def test_occupancy_skip_and_early_exit_are_neutral(key):
    grid = _make_grid(key, sparse=True)
    pose = pose_spherical(210.0, -45.0, 4.0)
    intrinsics = CameraIntrinsics(IMG, IMG, IMG * 1.1)

    base = render_image_planes(grid, pose, intrinsics, _config(), interpret=True)
    fast = render_image_planes(
        grid, pose, intrinsics,
        _config(bricked_occupancy_alpha_thresh=1e-4, bricked_exit_eps=1e-4),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(base.colour), np.asarray(fast.colour), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(base.extra[EXTRA_ACCUMULATED_WEIGHTS]),
        np.asarray(fast.extra[EXTRA_ACCUMULATED_WEIGHTS]),
        atol=5e-3,
    )


def test_non_multiple_of_tile_image_crops(key):
    grid = _make_grid(key)
    pose = pose_spherical(33.0, -20.0, 4.0)
    intrinsics = CameraIntrinsics(37, 29, 40.0)

    out = render_image_planes(grid, pose, intrinsics, _config(), interpret=True)
    assert out.colour.shape == (37, 29, 3)
    colour, _, acc, _ = _oracle_render(grid, pose, intrinsics, 2)
    np.testing.assert_allclose(np.asarray(out.colour), np.asarray(colour), atol=2e-2)


def test_pipeline_gradient_flows_and_is_finite(key):
    """End-to-end grad through repack_plane_grid + the kernel VJP."""
    from thr3ed_atom_tpu.rendering.planes import (
        build_tables,
        compute_ray_features,
        occupancy_mip,
        repack_plane_grid,
        statics_for_grid,
    )
    from thr3ed_atom_tpu.ops.pallas.plane_march import plane_march

    grid = _make_grid(key)
    pose = pose_spherical(120.0, -30.0, 4.0)
    statics = statics_for_grid(
        grid, *dominant_axis_for_pose(pose.rotation),
        exit_eps=0.0, occupancy_alpha_thresh=0.0, interpret=True, pos_per_cell=2,
    )
    intrinsics = CameraIntrinsics(16, 16, 18.0)
    rays = cast_rays(intrinsics, pose)
    rays_o = rays.origins.reshape(1, -1, 3)
    rays_d = rays.directions.reshape(1, -1, 3)
    rays_feat = compute_ray_features(rays_o, rays_d, statics)
    occ = occupancy_mip(grid, statics)
    tables, counts, _ = build_tables(rays_feat, occ, statics)

    def loss(densities, features):
        g = dataclasses.replace(grid, densities=densities, features=features)
        repacked = repack_plane_grid(g, statics)
        out = plane_march(
            tables, counts, rays_feat, repacked, ncoeff=9,
            relu_sigma=statics.relu_sigma, exit_eps=0.0, interpret=True,
        )
        return jnp.sum(out[..., :4] ** 2)

    gd, gf = jax.grad(loss, argnums=(0, 1))(grid.densities, grid.features)
    assert np.isfinite(np.asarray(gd, np.float32)).all()
    assert np.isfinite(np.asarray(gf, np.float32)).all()
    assert float(jnp.max(jnp.abs(gd))) > 0.0
    assert float(jnp.max(jnp.abs(gf))) > 0.0


def test_pos_per_cell_converges_to_high_spp_exact(key):
    """P=4 trapezoid must land closer to a 512-spp exact render than P=1."""
    from thr3ed_atom_tpu.rendering.renderer import RENDER_PROCEDURES
    from thr3ed_atom_tpu.rendering.rays import flatten_rays

    grid = _make_grid(key)
    pose = pose_spherical(140.0, -40.0, 4.0)
    intrinsics = CameraIntrinsics(16, 16, 18.0)
    rays = flatten_rays(cast_rays(intrinsics, pose))
    cfg = _config(num_samples_per_ray=512, optimized_sampling=True)
    exact = RENDER_PROCEDURES["render_sh_voxel_grid"](grid, rays, cfg)
    exact_img = exact.colour.reshape(16, 16, 3)

    errs = {}
    for p in (1, 4):
        out = render_image_planes(
            grid, pose, intrinsics, _config(planes_pos_per_cell=p), interpret=True
        )
        errs[p] = float(jnp.mean((out.colour - exact_img) ** 2))
    # a uniform-random grid is the quadrature worst case (all energy at the
    # Nyquist frequency), so the bound is loose; trained-scene accuracy is
    # pinned separately (experiments/quality_trapezoid_scene.py, production gates)
    assert errs[4] < 0.3 * errs[1]
    assert errs[4] < 2e-3, errs
