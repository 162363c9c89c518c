"""Bricked (slab-march) renderer: numerics vs an exact-oracle composite.

The kernel samples at slab crossings (x-cell-center planes along the march axis),
where the grid's trilinear interpolant equals the average of the two adjacent vertex
planes. The oracle below evaluates the EXACT f32 trilinear interpolant
(models.voxels.VoxelGrid.__call__, itself pinned against torch grid_sample) at the
same crossing depths and composites identically — so forward parity here pins every
stage of the kernel (tables, DMA patches, tent weights, SH fold, compositing) up to
the bf16 grid/weight precision.

Runs the Pallas kernel in interpreter mode on the CPU test backend.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thr3ed_atom_tpu.models.voxels import VoxelGrid, VoxelSize, create_voxel_grid
from thr3ed_atom_tpu.ops.sh import evaluate_spherical_harmonics
from thr3ed_atom_tpu.rendering.bricked import (
    dominant_axis_for_pose,
    render_image_bricked,
)
from thr3ed_atom_tpu.rendering.rays import cast_rays
from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
from thr3ed_atom_tpu.utils.camera import (
    CameraBounds,
    CameraIntrinsics,
    pose_spherical,
)
from thr3ed_atom_tpu.utils.constants import (
    EXTRA_ACCUMULATED_WEIGHTS,
    EXTRA_DIFFUSE_COLOUR,
)

GRID = 16
IMG = 32


def _make_grid(key, sparse=False):
    grid = create_voxel_grid(
        key,
        grid_dims=(GRID, GRID, GRID),
        num_features=27,
        voxel_size=VoxelSize(3.0 / GRID, 3.0 / GRID, 3.0 / GRID),
        density_preactivation="abs",
        expected_density_scale=20.0,
    )
    if sparse:
        # carve out everything except a central blob so occupancy skipping engages
        coords = jnp.stack(
            jnp.meshgrid(*[jnp.arange(GRID)] * 3, indexing="ij"), axis=-1
        )
        dist = jnp.linalg.norm(coords - (GRID - 1) / 2.0, axis=-1, keepdims=True)
        mask = (dist < GRID / 5.0).astype(jnp.float32)
        grid = grid.replace_arrays(densities=grid.densities * mask)
    return grid


# VoxelGrid is a frozen dataclass; small helper for tests
def _replace_arrays(self, **kw):
    import dataclasses

    return dataclasses.replace(self, **kw)


VoxelGrid.replace_arrays = _replace_arrays


def _oracle_render(grid: VoxelGrid, pose, intrinsics, white_bkgd=False):
    """Exact f32 composite at the slab-crossing depths of the bricked renderer."""
    axis, flip = dominant_axis_for_pose(pose.rotation)
    dims = grid.grid_dims
    aabb = grid.aabb
    lo_a, hi_a = aabb[axis]
    n_a = dims[axis]
    cell = (hi_a - lo_a) / n_a
    num_slabs = n_a - 1

    rays = cast_rays(intrinsics, pose)
    o = rays.origins.reshape(-1, 3)
    d = rays.directions.reshape(-1, 3)

    j = jnp.arange(num_slabs, dtype=jnp.float32)
    k_phys = (num_slabs - 1) - j if flip else j
    w_k = lo_a + (k_phys + 1.0) * cell  # world coord of each crossing
    s = (w_k[None, :] - o[:, axis:axis + 1]) / d[:, axis:axis + 1]  # [N, S]

    pts = o[:, None, :] + d[:, None, :] * s[..., None]
    inside = grid.test_inside_volume(pts.reshape(-1, 3))[:, 0].reshape(s.shape)
    valid = inside & (s > 0.0)
    # also require front-to-back marching (s increasing in j)
    step = s[:, 1:2] - s[:, 0:1]
    valid = valid & (step > 0.0)

    out = grid(pts.reshape(-1, 3))
    feats, sigma = out[:, :-1], out[:, -1]
    sigma = jnp.where(valid.reshape(-1), sigma, 0.0).reshape(s.shape)

    viewdirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    sh = feats.reshape(*s.shape, 3, 9)
    radiance = evaluate_spherical_harmonics(2, sh, viewdirs[:, None, :])
    colour_s = jax.nn.sigmoid(radiance)  # [N, S, 3]
    diffuse_s = jax.nn.sigmoid(
        evaluate_spherical_harmonics(0, sh[..., :1], viewdirs[:, None, :])
    )

    delta = jnp.abs(step) * jnp.linalg.norm(d, axis=-1, keepdims=True)
    alpha = jnp.clip(1.0 - jnp.exp(-sigma * delta), 0.0, 1.0)
    trans = jnp.cumprod(1.0 - alpha, axis=-1)
    excl = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
    w = alpha * excl
    colour = jnp.sum(colour_s * w[..., None], axis=1)
    diffuse = jnp.sum(diffuse_s * w[..., None], axis=1)
    acc = jnp.sum(w, axis=1, keepdims=True)
    depth = jnp.sum(s * w, axis=1, keepdims=True)
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
        # the oracle in this file samples at K=1 slab crossings; the production
        # default K=2 samples different positions by design (see the
        # axis-supersample convergence test)
        bricked_axis_supersample=1,
    )
    defaults.update(kw)
    return SHVoxGridRenderConfig(**defaults)


@pytest.mark.parametrize("yaw,pitch", [(30.0, -35.0), (120.0, -10.0), (260.0, -60.0)])
def test_bricked_matches_exact_oracle(key, yaw, pitch):
    grid = _make_grid(key)
    pose = pose_spherical(yaw, pitch, 4.0)
    intrinsics = CameraIntrinsics(IMG, IMG, IMG * 1.1)

    out = render_image_bricked(grid, pose, intrinsics, _config(), interpret=True)
    colour, depth, acc, _ = _oracle_render(grid, pose, intrinsics)

    np.testing.assert_allclose(np.asarray(out.colour), np.asarray(colour), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(out.extra[EXTRA_ACCUMULATED_WEIGHTS]), np.asarray(acc), atol=2e-2
    )
    np.testing.assert_allclose(np.asarray(out.depth), np.asarray(depth), atol=0.1)
    # the scene must actually be non-trivial for the comparison to mean anything
    assert float(jnp.max(acc)) > 0.5


def test_bricked_white_bkgd_and_diffuse(key):
    grid = _make_grid(key)
    pose = pose_spherical(75.0, -25.0, 4.0)
    intrinsics = CameraIntrinsics(IMG, IMG, IMG * 1.1)

    out = render_image_bricked(
        grid, pose, intrinsics,
        _config(white_bkgd=True, also_render_diffuse=True), interpret=True,
    )
    colour, _, _, diffuse = _oracle_render(grid, pose, intrinsics, white_bkgd=True)
    np.testing.assert_allclose(np.asarray(out.colour), np.asarray(colour), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(out.extra[EXTRA_DIFFUSE_COLOUR]), np.asarray(diffuse), atol=2e-2
    )


def test_occupancy_skip_and_early_exit_are_neutral(key):
    """Enabling empty-space skipping + early exit must not change the image."""
    grid = _make_grid(key, sparse=True)
    pose = pose_spherical(200.0, -45.0, 4.0)
    intrinsics = CameraIntrinsics(IMG, IMG, IMG * 1.1)

    base = render_image_bricked(grid, pose, intrinsics, _config(), interpret=True)
    skipped = render_image_bricked(
        grid, pose, intrinsics,
        _config(bricked_occupancy_alpha_thresh=1e-4, bricked_exit_eps=1e-4),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(skipped.colour), np.asarray(base.colour), atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(skipped.extra[EXTRA_ACCUMULATED_WEIGHTS]),
        np.asarray(base.extra[EXTRA_ACCUMULATED_WEIGHTS]),
        atol=3e-3,
    )


def test_non_multiple_of_tile_image_crops(key):
    """Image dims that aren't multiples of 16 render via padding + crop."""
    grid = _make_grid(key)
    pose = pose_spherical(30.0, -35.0, 4.0)
    full = render_image_bricked(
        grid, pose, CameraIntrinsics(32, 32, 32 * 1.1), _config(), interpret=True
    )
    odd = render_image_bricked(
        grid, pose, CameraIntrinsics(25, 19, 32 * 1.1), _config(), interpret=True
    )
    assert odd.colour.shape == (25, 19, 3)
    # same focal + same principal-point convention: the odd image is NOT a crop of
    # the 32x32 one (centers differ), so just sanity-check finiteness and range
    assert bool(jnp.all(jnp.isfinite(odd.colour)))


def test_volumetric_model_dispatches_bricked(key):
    from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel

    grid = _make_grid(key)
    vol_mod = VolumetricModel(
        grid,
        render_procedure="render_sh_voxel_grid_bricked",
        render_config=_config(),
    )
    pose = pose_spherical(30.0, -35.0, 4.0)
    intrinsics = CameraIntrinsics(IMG, IMG, IMG * 1.1)
    out = vol_mod.render(pose, intrinsics)
    colour, _, _, _ = _oracle_render(grid, pose, intrinsics)
    np.testing.assert_allclose(np.asarray(out.colour), np.asarray(colour), atol=2e-2)
    # repack cache: second render of the same pose family reuses the prepared grid
    assert len(vol_mod._image_render_cache) == 1
    vol_mod.render(pose, intrinsics)
    assert len(vol_mod._image_render_cache) == 1


def test_bricked_flat_ray_batches_route_to_fast(key):
    """Arbitrary [N,3] ray sets through the bricked procedure (reference
    render_interface.py:103-134 API uniformity): served via the explicit
    fast-path switch, identical to calling the fast procedure directly."""
    from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
    from thr3ed_atom_tpu.rendering.fast_renderer import render_sh_voxel_grid_fast
    from thr3ed_atom_tpu.rendering.interface import Rays

    grid = _make_grid(key)
    config = _config()
    rng = np.random.default_rng(1)
    origins = jnp.asarray(rng.normal(0, 0.2, (32, 3)) + [0, 0, 4.0], jnp.float32)
    dirs = jnp.asarray(rng.normal(0, 0.3, (32, 3)) + [0, 0, -1.0], jnp.float32)
    rays = Rays(origins=origins, directions=dirs)

    vol_mod = VolumetricModel(
        grid,
        render_procedure="render_sh_voxel_grid_bricked",
        render_config=config,
    )
    out = vol_mod.render_rays(rays)
    ref = render_sh_voxel_grid_fast(grid, rays, config.replace(
        perturb_sampled_points=config.perturb_sampled_points))
    np.testing.assert_allclose(
        np.asarray(out.colour), np.asarray(ref.colour), atol=1e-6
    )
    assert np.isfinite(np.asarray(out.depth)).all()


def test_diagonal_pose_with_overflow_splitting(key):
    """A near-diagonal pose (per-ray slopes |du/dslab| ~ 3) exercises the
    half/single-slab entry splitting; parity vs the oracle must hold."""
    grid = _make_grid(key)
    pose = pose_spherical(46.0, -49.5, 4.0)
    intrinsics = CameraIntrinsics(IMG, IMG, IMG * 1.1)
    out = render_image_bricked(grid, pose, intrinsics, _config(), interpret=True)
    colour, depth, acc, _ = _oracle_render(grid, pose, intrinsics)
    np.testing.assert_allclose(np.asarray(out.colour), np.asarray(colour), atol=2e-2)
    np.testing.assert_allclose(
        np.asarray(out.extra[EXTRA_ACCUMULATED_WEIGHTS]), np.asarray(acc), atol=2e-2
    )


def test_lattice_tables_match_exact_tables(key):
    """Footprints bounded from the 4x4 ray lattice must produce the same image as
    bounding from all rays (the margin absorbs the quasi-affine curvature)."""
    from thr3ed_atom_tpu.rendering.bricked import (
        _tile_image_rays,
        build_tables,
        compute_ray_features,
        prepare_bricked_grid,
        statics_for_grid,
    )
    from thr3ed_atom_tpu.ops.pallas.slab_march import slab_march_render

    grid = _make_grid(key)
    for yaw, pitch in [(46.0, -49.5), (120.0, -10.0)]:
        pose = pose_spherical(yaw, pitch, 4.0)
        rot = np.asarray(pose.rotation).reshape(3, 3)
        from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose

        axis, flip = dominant_axis_for_pose(rot)
        statics = statics_for_grid(grid, axis, flip, exit_eps=0.0,
                                   occupancy_alpha_thresh=0.0, interpret=True)
        repacked, occ = prepare_bricked_grid(grid, statics)
        ro, rd = _tile_image_rays(
            IMG, IMG, IMG * 1.1, IMG, IMG,
            jnp.asarray(rot, jnp.float32),
            jnp.asarray(np.asarray(pose.translation), jnp.float32).reshape(3),
            statics.tile_px,
        )
        rf = compute_ray_features(ro, rd, statics)
        outs = []
        for exact in (False, True):
            tabs, counts, ovf = build_tables(rf, occ, statics, exact_spans=exact)
            assert not bool(ovf)
            outs.append(
                slab_march_render(
                    tabs, counts, rf, repacked, ncoeff=statics.ncoeff,
                    relu_sigma=False, exit_eps=0.0, with_diffuse=False,
                    interpret=True,
                )
            )
        np.testing.assert_allclose(
            np.asarray(outs[0]), np.asarray(outs[1]), atol=1e-5
        )


def test_bricked_axis_supersample_converges_to_exact(key):
    """K march samples per cell (bricked_axis_supersample) must monotonically
    close the quadrature gap to the exact uniform-sampling renderer at high spp:
    the slab positions/field values are exact for every K, so the only error is
    the compositing step size, which shrinks as 1/K."""
    from thr3ed_atom_tpu.rendering.interface import Rays
    from thr3ed_atom_tpu.rendering.renderer import render_sh_voxel_grid

    grid = _make_grid(key)
    pose = pose_spherical(40.0, -30.0, 4.0)
    intrinsics = CameraIntrinsics(IMG, IMG, IMG * 1.1)

    # ground truth: the exact renderer at a dense uniform sampling
    exact_config = SHVoxGridRenderConfig(
        num_samples_per_ray=512,
        camera_bounds=CameraBounds(1.0, 8.0),
        perturb_sampled_points=False,
        optimized_sampling=True,
        white_bkgd=False,
    )
    rays = cast_rays(intrinsics, pose)
    flat = Rays(
        origins=rays.origins.reshape(-1, 3),
        directions=rays.directions.reshape(-1, 3),
    )
    exact = np.asarray(
        render_sh_voxel_grid(grid, flat, exact_config, None).colour
    ).reshape(IMG, IMG, 3)

    errs = []
    for k in (1, 2, 4):
        out = render_image_bricked(
            grid, pose, intrinsics, _config(bricked_axis_supersample=k),
            interpret=True,
        )
        errs.append(float(np.mean((np.asarray(out.colour) - exact) ** 2)))
    # K=2 must cut the quadrature MSE roughly in half; K=4 keeps improving but
    # approaches the 512-spp ground truth's OWN quadrature error, so only
    # monotonicity is asserted there
    assert errs[1] < 0.55 * errs[0], errs
    assert errs[2] < 0.85 * errs[1], errs


def test_repack_jit_matches_eager_at_large_shape():
    """The jitted repack must equal the op-by-op (eager) repack bit-for-bit.

    Regression guard for an XLA:TPU miscompilation of the K-interleave: with the
    interleave expressed as stack(axis+1)+reshape+flip+transpose in one jitted
    graph, the TPU backend produced 667K wrong values at 128^3 / K=2 (eager was
    exact; K=1/K=4 and all CPU shapes were unaffected). The repack now builds
    the interleave from per-sub transposed arrays with a leading-dim merge; this
    test pins jit == eager at the shape that miscompiled, on whatever backend
    the suite runs on."""
    from thr3ed_atom_tpu.rendering.bricked import (
        prepare_bricked_grid,
        repack_slab_grid,
        statics_for_grid,
    )

    g = 128
    rng = np.random.default_rng(5)
    dens = rng.standard_normal((g, g, g, 1), dtype=np.float32)
    feats = rng.standard_normal((g, g, g, 27), dtype=np.float32)
    grid = VoxelGrid(
        densities=jnp.asarray(dens),
        features=jnp.asarray(feats),
        voxel_size=VoxelSize(3.0 / g, 3.0 / g, 3.0 / g),
        density_preactivation="identity",
        density_postactivation="relu",
    )
    st = statics_for_grid(grid, 2, True, axis_supersample=2)
    eager = np.asarray(repack_slab_grid(grid, st, 0.5).astype(jnp.float32))
    jitted = np.asarray(prepare_bricked_grid(grid, st)[0].astype(jnp.float32))
    # fusion may contract the lerp differently (1-ULP bf16 differences are fine);
    # the miscompile this guards against produced |d| up to ~9 on 667K elements
    np.testing.assert_allclose(jitted, eager, atol=0.05)
