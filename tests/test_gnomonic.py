"""Gnomonic shear-warp renderer: numerics vs the exact trapezoid oracle.

Two layers of checks (both on CPU, kernel in interpret mode):
  * gnomonic-space texels vs an exact f32 trapezoid composite at the SAME rays
    (the march itself is oracle-exact up to the bf16 resample)
  * the warped camera image vs per-pixel oracle rendering (the projective
    warp is the only approximation; tolerance reflects its interpolation)

Reference semantics being replaced: thre3d_atom/thre3d_reprs/voxels.py:295-321
+ process.py:20 + accumulate.py:49-88 (same quadrature as tests/test_planes.py).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from thr3ed_atom_tpu.models.voxels import VoxelGrid, VoxelSize
from thr3ed_atom_tpu.ops.pallas.plane_march import _relu_trap
from thr3ed_atom_tpu.ops.sh import evaluate_spherical_harmonics
from thr3ed_atom_tpu.rendering.bricked import _uv_axes, dominant_axis_for_pose
from thr3ed_atom_tpu.rendering import gnomonic as gn
from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
from thr3ed_atom_tpu.utils.camera import (
    CameraBounds,
    CameraIntrinsics,
    pose_spherical,
)

jax.config.update("jax_platforms", "cpu")


@pytest.fixture
def key():
    return jax.random.PRNGKey(7)


def _make_grid(key, size=12, post="identity", ncoeff=9):
    kd, kf = jax.random.split(key)
    if post == "relu":
        densities = jax.random.uniform(kd, (size, size, size, 1), minval=-2.0, maxval=4.0)
        pre = "identity"
    else:
        densities = jax.random.uniform(kd, (size, size, size, 1), minval=0.0, maxval=4.0)
        pre = "identity"
    features = jax.random.normal(kf, (size, size, size, 3 * ncoeff)) * 0.4
    return VoxelGrid(
        densities=densities,
        features=features,
        voxel_size=VoxelSize(2.0 / size, 2.0 / size, 2.0 / size),
        density_preactivation=pre,
        density_postactivation=post,
    )


def _oracle_at_rays(grid, origin, dirs, P, axis, flip, relu_sigma, ncoeff=9,
                    want_diffuse=False):
    """Exact f32 trapezoid composite at explicit rays (mirrors
    tests/test_planes.py::_oracle_render)."""
    dims = grid.grid_dims
    aabb = grid.aabb
    lo_a, hi_a = aabb[axis]
    n_a = dims[axis]
    cell = (hi_a - lo_a) / n_a
    num_pos = (n_a - 1) * P + 1
    o = jnp.broadcast_to(jnp.asarray(origin, jnp.float32), dirs.shape)
    d = dirs
    j = jnp.arange(num_pos, dtype=jnp.float32)
    t_cont = (num_pos - 1 - j) / P if flip else j / P
    w_k = lo_a + (t_cont + 0.5) * cell
    s = (w_k[None, :] - o[:, axis:axis + 1]) / d[:, axis:axis + 1]
    pts = o[:, None, :] + d[:, None, :] * s[..., None]
    inside = grid.test_inside_volume(pts.reshape(-1, 3))[:, 0].reshape(s.shape)
    valid = inside & (s > 0.0)
    pre_d, pre_f = grid.activated_grids()
    unified = jnp.concatenate([pre_f, pre_d], axis=-1)
    from thr3ed_atom_tpu.ops.grid_sample import trilinear_grid_sample

    vals = trilinear_grid_sample(unified, grid.normalize_points(pts.reshape(-1, 3)))
    feats, sigma = vals[:, :-1], vals[:, -1]
    sigma = sigma.reshape(s.shape)
    viewdirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    deg = {1: 0, 4: 1, 9: 2, 16: 3}[ncoeff]
    sh = feats.reshape(*s.shape, 3, ncoeff)
    raw_rgb = evaluate_spherical_harmonics(deg, sh, viewdirs[:, None, :])
    raw_dif = evaluate_spherical_harmonics(0, sh[..., :1], viewdirs[:, None, :])
    a_s, b_s = sigma[:, :-1], sigma[:, 1:]
    integ, tbar, _, _ = _relu_trap(a_s, b_s, relu_sigma)
    cell_live = valid[:, :-1] & valid[:, 1:]
    integ = jnp.where(cell_live, integ, 0.0)
    delta = jnp.abs(s[:, 1:2] - s[:, 0:1]) * jnp.linalg.norm(
        d, axis=-1, keepdims=True
    )
    alpha = jnp.clip(1.0 - jnp.exp(-integ * delta), 0.0, 1.0)
    tb = tbar[..., None]
    mid = jax.nn.sigmoid((1.0 - tb) * raw_rgb[:, :-1] + tb * raw_rgb[:, 1:])
    dmid = jax.nn.sigmoid((1.0 - tb) * raw_dif[:, :-1] + tb * raw_dif[:, 1:])
    trans = jnp.cumprod(1.0 - alpha, axis=-1)
    excl = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
    w = alpha * excl
    colour = jnp.sum(mid * w[..., None], axis=1)
    diffuse = jnp.sum(dmid * w[..., None], axis=1)
    acc = jnp.sum(w, axis=1, keepdims=True)
    s_dep = s[:, :-1] + (s[:, 1:] - s[:, :-1]) * tbar
    depth = jnp.sum(s_dep * w, axis=1, keepdims=True)
    return colour, acc, depth, diffuse


def _config(**kw):
    kw.setdefault("num_samples_per_ray", 32)
    kw.setdefault("camera_bounds", CameraBounds(1.0, 6.0))
    return SHVoxGridRenderConfig(**kw)


@pytest.mark.parametrize(
    "yaw,pitch,P",
    [(30.0, -40.0, 1), (123.0, -35.0, 2), (250.0, -75.0, 1), (0.1, -5.0, 2)],
)
def test_gnomonic_texels_match_oracle(key, yaw, pitch, P):
    """The composited gnomonic image IS an exact trapezoid render of the texel
    rays (up to the bf16 resample)."""
    grid = _make_grid(key, post="relu")
    pose = pose_spherical(yaw, pitch, 3.5)
    H = W = 48
    focal = 52.0
    rotation = np.asarray(pose.rotation).reshape(3, 3)
    origin = np.asarray(pose.translation).reshape(3)
    axis, flip = dominant_axis_for_pose(rotation)
    u_ax, v_ax = _uv_axes(axis)
    g = -1.0 if flip else 1.0
    statics = gn.statics_for_grid(grid, axis, flip, pos_per_cell=P, interpret=True)
    slices = gn.repack_position_slices(grid, statics)
    state, xr, yr = gn._march_gnomonic(
        slices, jnp.asarray(rotation, jnp.float32), jnp.asarray(origin, jnp.float32),
        statics, H, W, float(focal), 1.25,
    )
    Pn, Qn, _pb, _pbs = gn.gnomonic_frame(None, H, W, focal, 1.25, statics)
    x0, x1 = float(xr[0]), float(xr[1])
    y0, y1 = float(yr[0]), float(yr[1])
    xs = np.linspace(x0, x1, Pn)
    ys = np.linspace(y0, y1, Qn)
    ps = np.arange(2, Pn - 2, 5)
    qs = np.arange(2, Qn - 2, 7)
    pg, qg = np.meshgrid(ps, qs, indexing="ij")
    dirs = np.zeros((pg.size, 3), np.float32)
    dirs[:, axis] = g
    dirs[:, u_ax] = xs[pg.ravel()]
    dirs[:, v_ax] = ys[qg.ravel()]
    oc, oa, _, _ = _oracle_at_rays(
        grid, origin, jnp.asarray(dirs), P, axis, flip, True
    )
    col = np.asarray(state[1]), np.asarray(state[2]), np.asarray(state[3])
    got = np.stack(
        [c[pg.ravel(), qg.ravel()] for c in col], axis=-1
    )
    acc = np.asarray(state[4])[pg.ravel(), qg.ravel()]
    assert np.max(np.abs(got - np.asarray(oc))) < 5e-3
    assert np.max(np.abs(acc - np.asarray(oa)[:, 0])) < 5e-3


def test_warped_image_matches_oracle_pixels(key):
    """End-to-end (march + warp) vs per-pixel oracle rendering."""
    grid = _make_grid(key, post="relu")
    pose = pose_spherical(200.0, -30.0, 3.5)
    H = W = 40
    intr = CameraIntrinsics(H, W, 44.0)
    rotation = np.asarray(pose.rotation).reshape(3, 3)
    origin = np.asarray(pose.translation).reshape(3)
    axis, flip = dominant_axis_for_pose(rotation)
    out = gn.render_image_gnomonic(
        grid, pose, intr, _config(white_bkgd=False, gnomonic_pos_per_cell=1),
        interpret=True,
    )
    px = np.arange(W) + 0.5
    py = np.arange(H) + 0.5
    gx, gy = np.meshgrid(px, py, indexing="xy")
    dcam = np.stack(
        [(gx - W / 2) / 44.0, -(gy - H / 2) / 44.0, -np.ones_like(gx)], -1
    )
    dirs = (dcam @ rotation.T).reshape(-1, 3).astype(np.float32)
    oc, oa, od, _ = _oracle_at_rays(
        grid, origin, jnp.asarray(dirs), 1, axis, flip, True
    )
    got = np.asarray(out.colour).reshape(-1, 3)
    # warp interpolation error: a random grid is the worst case for the final
    # bilinear warp (pure high-frequency content); smooth/trained scenes
    # measure 54+ dB at production scale (experiments/proto_gnomonic3.py)
    mse = float(np.mean((got - np.asarray(oc)) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 35.0, psnr
    acc = np.asarray(out.extra["accumulated_weight"]).reshape(-1)
    assert np.mean(np.abs(acc - np.asarray(oa)[:, 0])) < 2e-2
    # depth (reference units): weight by acc to skip empty rays
    dep = np.asarray(out.depth).reshape(-1)
    m = np.asarray(oa)[:, 0] > 0.5
    if m.any():
        assert np.median(np.abs(dep[m] - np.asarray(od)[m, 0])) < 0.05


def test_bicubic_warp_beats_bilinear_on_smooth_scene(key):
    """The Catmull-Rom warp (default) must reconstruct a smooth scene more
    accurately than the bilinear tap — it exists to clear the warp-limited
    quality ceiling (~79 dB at production scale with bilinear)."""
    # smooth scene: blur the random grid so the composited field is dominated
    # by low frequencies (where the cubic's higher-order accuracy shows)
    # 48^3 (not the default 12^3): the round-5 128-texel frame floor makes a
    # 12-voxel scene ~10.7 texels/voxel — over-resolved to the point where
    # every warp order reconstructs it; 48^3 keeps detail at the ~2.7
    # texels/voxel scale the warp orders actually differ at
    grid = _make_grid(key, size=48, post="relu")
    k = jnp.ones((3, 3, 3)) / 27.0

    def blur(a):
        pads = [(1, 1)] * 3 + [(0, 0)]
        ap = jnp.pad(a, pads, mode="edge")
        out = jnp.zeros_like(a)
        for dx in range(3):
            for dy in range(3):
                for dz in range(3):
                    out = out + k[dx, dy, dz] * ap[
                        dx:dx + a.shape[0], dy:dy + a.shape[1],
                        dz:dz + a.shape[2]]
        return out

    import dataclasses
    grid = dataclasses.replace(
        grid, densities=blur(grid.densities), features=blur(grid.features)
    )
    pose = pose_spherical(200.0, -30.0, 3.5)
    # 100 px: with the round-5 128-mult frame rounding, a 40 px image gets a
    # 128-texel frame (3.2 texels/pixel) where ANY warp order reconstructs
    # well; 100 px restores the production-like ~1.3 texels/pixel ratio the
    # warp-order difference exists at
    H = W = 100
    intr = CameraIntrinsics(H, W, 110.0)
    rotation = np.asarray(pose.rotation).reshape(3, 3)
    origin = np.asarray(pose.translation).reshape(3)
    axis, flip = dominant_axis_for_pose(rotation)
    px = np.arange(W) + 0.5
    py = np.arange(H) + 0.5
    gx, gy = np.meshgrid(px, py, indexing="xy")
    dcam = np.stack(
        [(gx - W / 2) / 110.0, -(gy - H / 2) / 110.0, -np.ones_like(gx)], -1
    )
    dirs = (dcam @ rotation.T).reshape(-1, 3).astype(np.float32)
    oc, _, _, _ = _oracle_at_rays(
        grid, origin, jnp.asarray(dirs), 4, axis, flip, True
    )
    oc = np.asarray(oc)

    def psnr_for(order):
        out = gn.render_image_gnomonic(
            grid, pose, intr,
            _config(white_bkgd=False, gnomonic_pos_per_cell=4,
                    gnomonic_warp_order=order),
            interpret=True,
        )
        got = np.asarray(out.colour).reshape(-1, 3)
        mse = float(np.mean((got - oc) ** 2))
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    # P=4 so along-ray quadrature error is converged and the warp dominates
    # (at P=1 quadrature drowns the warp difference; experiments/probe_warp.py)
    p1 = psnr_for(1)
    p3 = psnr_for(3)
    assert p3 > p1 + 0.5, (p1, p3)


def test_occupancy_skip_and_early_exit_neutral(key):
    """The (u-block x position) occupancy skip is EXACTLY lossless on sparse
    scenes (both-endpoint-empty cells integrate to zero identically) and
    early exit at eps changes outputs by at most ~eps."""
    import dataclasses

    grid = _make_grid(key, size=16, post="relu")
    # carve: only a small central blob retains density
    coords = jnp.stack(jnp.meshgrid(*[jnp.arange(16)] * 3, indexing="ij"), -1)
    dist = jnp.linalg.norm(coords - 7.5, axis=-1, keepdims=True)
    mask = (dist < 3.0).astype(jnp.float32)
    grid = dataclasses.replace(
        grid, densities=jnp.where(mask > 0, grid.densities, -1.0)
    )
    pose = pose_spherical(140.0, -30.0, 3.5)
    intr = CameraIntrinsics(32, 32, 36.0)

    out_skip = gn.render_image_gnomonic(
        grid, pose, intr,
        _config(white_bkgd=True, gnomonic_pos_per_cell=1, gnomonic_exit_eps=0.0),
        interpret=True,
    )
    # occupancy off: route through composite_positions with occupancy=None
    rotation = np.asarray(pose.rotation).reshape(3, 3)
    axis, flip = dominant_axis_for_pose(rotation)
    statics = gn.statics_for_grid(grid, axis, flip, with_diffuse=False,
                                  pos_per_cell=1, interpret=True)
    slices = gn.repack_position_slices(grid, statics)
    rot_j = jnp.asarray(rotation, jnp.float32)
    origin = jnp.asarray(np.asarray(pose.translation).reshape(3), jnp.float32)
    Pn, Qn, PB, Pb = gn.gnomonic_frame(None, 32, 32, 36.0, 1.25, statics)
    geo = gn.gnomonic_geometry(rot_j, origin, statics, 32, 32, 36.0, 1.25)
    t1 = gn.resample_u(slices, geo.Ru)
    state_all = gn.composite_positions(
        t1, geo.RvT, geo.ybasis, geo.live_u, geo.live_v, geo.norm, geo.geom,
        statics, Pn, Qn, PB, Pb, occupancy=None,
    )
    from thr3ed_atom_tpu.rendering.warp_matmul import warp_swap_for_pose

    out_all = gn._warp_to_camera(
        state_all, geo.xr, geo.yr, rot_j, statics, 32, 32, 36.0, 1.25, True,
        warp_impl="matmul",
        warp_swap=warp_swap_for_pose(rotation, axis, flip, 32, 32, 36.0),
    )
    # to 1 ulp: out_skip runs through the jitted pipeline, out_all through
    # eager stage calls — XLA:CPU fuses the two differently, which can
    # reassociate float chains by an ulp at the round-5 128-mult frame. The
    # skip rule itself is exact (both-endpoint-empty cells integrate to
    # exactly zero in either program).
    np.testing.assert_allclose(
        np.asarray(out_skip.colour), np.asarray(out_all.colour), atol=5e-7
    )

    # a sanity check that the flags actually skip a large fraction
    cl, pn_flags = gn.gnomonic_occupancy(slices, geo.Ru, statics, PB, Pb)
    assert float(jnp.mean(pn_flags.astype(jnp.float32))) < 0.8

    out_exit = gn.render_image_gnomonic(
        grid, pose, intr,
        _config(white_bkgd=True, gnomonic_pos_per_cell=1,
                gnomonic_exit_eps=1e-4),
        interpret=True,
    )
    assert float(jnp.max(jnp.abs(out_exit.colour - out_skip.colour))) < 1e-3


def test_white_bkgd_and_diffuse(key):
    grid = _make_grid(key, post="relu")
    pose = pose_spherical(75.0, -20.0, 3.5)
    intr = CameraIntrinsics(32, 32, 36.0)
    out = gn.render_image_gnomonic(
        grid, pose, intr,
        _config(white_bkgd=True, render_diffuse=True, gnomonic_pos_per_cell=1),
        interpret=True,
    )
    assert "diffuse_colour" in out.extra
    col = np.asarray(out.colour)
    dif = np.asarray(out.extra["diffuse_colour"])
    acc = np.asarray(out.extra["accumulated_weight"])
    # empty corners composite to white
    edge = acc < 1e-3
    assert edge.any()
    assert np.allclose(col[edge[..., 0]], 1.0, atol=1e-3)
    assert np.allclose(dif[edge[..., 0]], 1.0, atol=1e-3)
    assert np.isfinite(np.asarray(out.extra["disparity"])).all()


def test_registered_procedure_and_volmod_dispatch(key):
    from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel

    grid = _make_grid(key, post="relu")
    vm = VolumetricModel(
        grid,
        render_procedure="render_sh_voxel_grid_gnomonic",
        render_config=_config(white_bkgd=True),
    )
    pose = pose_spherical(10.0, -55.0, 3.5)
    intr = CameraIntrinsics(24, 24, 26.0)
    out = vm.render(pose, intr)
    assert out.colour.shape == (24, 24, 3)
    assert np.isfinite(np.asarray(out.colour)).all()
    # repack cache reused on second render of the same axis variant
    out2 = vm.render(pose, intr)
    assert np.allclose(np.asarray(out.colour), np.asarray(out2.colour))
    # arbitrary flat ray sets route through the fast procedure (explicit,
    # logged switch — reference render_interface.py:103-134 API uniformity)
    from thr3ed_atom_tpu.rendering.fast_renderer import render_sh_voxel_grid_fast
    from thr3ed_atom_tpu.rendering.interface import Rays
    from thr3ed_atom_tpu.rendering.renderer import RENDER_PROCEDURES

    rng = np.random.default_rng(0)
    origins = jnp.asarray(rng.normal(0, 0.1, (16, 3)) + [0, 0, 4.0], jnp.float32)
    dirs = jnp.asarray(rng.normal(0, 0.2, (16, 3)) + [0, 0, -1.0], jnp.float32)
    rays = Rays(origins=origins, directions=dirs)
    cfg = _config(white_bkgd=True, perturb_sampled_points=False)
    out_flat = RENDER_PROCEDURES["render_sh_voxel_grid_gnomonic"](grid, rays, cfg)
    out_fast = render_sh_voxel_grid_fast(grid, rays, cfg)
    np.testing.assert_allclose(
        np.asarray(out_flat.colour), np.asarray(out_fast.colour), atol=1e-6
    )


def test_render_poses_batched_matches_per_pose(key):
    """The batched multi-pose path (one lax.map dispatch per march variant,
    rendering/gnomonic.py render_poses_gnomonic) must reproduce the per-pose
    renders exactly, in input order, across variant boundaries and group-batch
    splits."""
    from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
    from thr3ed_atom_tpu.rendering import gnomonic as gn

    grid = _make_grid(key, post="relu")
    config = _config(white_bkgd=True)
    intr = CameraIntrinsics(24, 24, 26.0)
    # poses spanning multiple dominant-axis variants
    poses = [
        pose_spherical(yaw, pitch, 3.5)
        for yaw, pitch in [(10.0, -55.0), (100.0, -10.0), (200.0, -80.0),
                           (10.0, -56.0), (280.0, -20.0)]
    ]
    batched = gn.render_poses_gnomonic(
        grid, poses, intr, config, group_batch=2
    )
    assert batched.colour.shape == (len(poses), 24, 24, 3)
    # tolerance: in CPU interpret mode the kernel body inlines into DIFFERENT
    # fusion contexts under lax.map vs a standalone jit, which can
    # reassociate float chains by ~1 ulp (measured 2e-6 on one pixel). On
    # the chip both contexts run the same Mosaic executable.
    for i, pose in enumerate(poses):
        single = gn.render_image_gnomonic(grid, pose, intr, config)
        np.testing.assert_allclose(
            np.asarray(batched.colour[i]), np.asarray(single.colour), atol=5e-6
        )
        np.testing.assert_allclose(
            np.asarray(batched.depth[i]), np.asarray(single.depth), atol=5e-6
        )
    # the VolumetricModel dispatcher reaches the same path
    vm = VolumetricModel(
        grid, render_procedure="render_sh_voxel_grid_gnomonic",
        render_config=config,
    )
    out_vm = vm.render_poses(poses[:2], intr)
    np.testing.assert_allclose(
        np.asarray(out_vm.colour), np.asarray(batched.colour[:2]), atol=1e-6
    )


def test_gnomonic_degree3_matches_oracle(key):
    """Degree-3 SH (16 coeffs, 48+1 channels) on the gnomonic path — the dense
    formulation has no slab-lane cap (reference spherical_harmonics.py:79
    supports degree 3; the bricked kernel stops at 2). Pinned in texel space
    where the march is oracle-exact; the final warp is degree-independent
    (it resamples the composited 8-channel state) and is covered by
    test_warped_image_matches_oracle_pixels."""
    grid = _make_grid(key, post="relu", ncoeff=16)
    pose = pose_spherical(140.0, -50.0, 3.5)
    H = W = 40
    focal = 44.0
    rotation = np.asarray(pose.rotation).reshape(3, 3)
    origin = np.asarray(pose.translation).reshape(3)
    axis, flip = dominant_axis_for_pose(rotation)
    u_ax, v_ax = _uv_axes(axis)
    g = -1.0 if flip else 1.0
    statics = gn.statics_for_grid(grid, axis, flip, pos_per_cell=1, interpret=True)
    slices = gn.repack_position_slices(grid, statics)
    state, xr, yr = gn._march_gnomonic(
        slices, jnp.asarray(rotation, jnp.float32), jnp.asarray(origin, jnp.float32),
        statics, H, W, float(focal), 1.25,
    )
    Pn, Qn, _pb, _pbs = gn.gnomonic_frame(None, H, W, focal, 1.25, statics)
    xs = np.linspace(float(xr[0]), float(xr[1]), Pn)
    ys = np.linspace(float(yr[0]), float(yr[1]), Qn)
    ps = np.arange(2, Pn - 2, 5)
    qs = np.arange(2, Qn - 2, 7)
    pg, qg = np.meshgrid(ps, qs, indexing="ij")
    dirs = np.zeros((pg.size, 3), np.float32)
    dirs[:, axis] = g
    dirs[:, u_ax] = xs[pg.ravel()]
    dirs[:, v_ax] = ys[qg.ravel()]
    oc, oa, _, _ = _oracle_at_rays(
        grid, origin, jnp.asarray(dirs), 1, axis, flip, True, ncoeff=16
    )
    col = np.asarray(state[1]), np.asarray(state[2]), np.asarray(state[3])
    got = np.stack([c[pg.ravel(), qg.ravel()] for c in col], axis=-1)
    acc = np.asarray(state[4])[pg.ravel(), qg.ravel()]
    assert np.max(np.abs(got - np.asarray(oc))) < 5e-3
    assert np.max(np.abs(acc - np.asarray(oa)[:, 0])) < 5e-3


def test_auto_pos_per_cell(key):
    grid = _make_grid(key, size=9)
    statics = gn.statics_for_grid(grid, 0, False, pos_per_cell=0)
    # 8 cells -> 256/8 = 32 -> capped at 8
    assert statics.pos_per_cell == 8
    g33 = _make_grid(key, size=33)
    statics = gn.statics_for_grid(g33, 0, False, pos_per_cell=0)
    assert statics.pos_per_cell == 8
    g129 = VoxelGrid(
        densities=jnp.zeros((129, 5, 5, 1)),
        features=jnp.zeros((129, 5, 5, 27)),
        voxel_size=VoxelSize(0.1, 0.1, 0.1),
    )
    statics = gn.statics_for_grid(g129, 0, False, pos_per_cell=0)
    assert statics.pos_per_cell == 2


@pytest.mark.parametrize("diffuse,P", [(False, 1), (True, 2)])
def test_qb_split_matches_stripe_kernel(key, diffuse, P):
    """The q-split path (gnomonic_qb=128 — since round 4 the FUSED v3 kernel:
    in-kernel u-resample + tents rebuilt from the affine geom scalars) must
    reproduce the whole-stripe kernel's image. The fused kernel's tent weights
    associate the affine differently before the bf16 rounding, so agreement is
    to bf16-resample tolerance rather than bitwise; with exit_eps>0 the finer
    exit grain may stop earlier, bounded by eps. Frame is sized so Qn = 256 ->
    QB = 2 (a real split)."""
    import dataclasses

    grid = _make_grid(key, size=16, post="relu")
    coords = jnp.stack(jnp.meshgrid(*[jnp.arange(16)] * 3, indexing="ij"), -1)
    dist = jnp.linalg.norm(coords - 7.5, axis=-1, keepdims=True)
    mask = (dist < 4.0).astype(jnp.float32)
    grid = dataclasses.replace(
        grid, densities=jnp.where(mask > 0, grid.densities, -1.0)
    )
    pose = pose_spherical(140.0, -30.0, 3.5)
    H = W = 128
    intr = CameraIntrinsics(H, W, 140.0)

    base = dict(white_bkgd=True, gnomonic_pos_per_cell=P,
                also_render_diffuse=diffuse)
    out_stripe = gn.render_image_gnomonic(
        grid, pose, intr,
        _config(gnomonic_exit_eps=0.0, gnomonic_qb=0, **base), interpret=True,
    )
    out_qb = gn.render_image_gnomonic(
        grid, pose, intr,
        _config(gnomonic_exit_eps=0.0, gnomonic_qb=128, **base),
        interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(out_stripe.colour), np.asarray(out_qb.colour), atol=3e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_stripe.depth), np.asarray(out_qb.depth), atol=2e-2
    )
    for k in out_stripe.extra:
        if k == "disparity":  # 1/depth amplifies the bf16-tent tolerance
            continue
        np.testing.assert_allclose(
            np.asarray(out_stripe.extra[k]), np.asarray(out_qb.extra[k]),
            atol=3e-3,
        )

    out_qb_exit = gn.render_image_gnomonic(
        grid, pose, intr,
        _config(gnomonic_exit_eps=1e-4, gnomonic_qb=128, **base),
        interpret=True,
    )
    assert float(jnp.max(jnp.abs(out_qb_exit.colour - out_stripe.colour))) < 4e-3

    # the q-split flags are a strict refinement: any-reduced over q-blocks
    # they must cover exactly the stripe flags' live set (never more)
    rotation = np.asarray(pose.rotation).reshape(3, 3)
    axis, flip = dominant_axis_for_pose(rotation)
    statics = gn.statics_for_grid(grid, axis, flip, with_diffuse=diffuse,
                                  pos_per_cell=P, interpret=True, qb=128)
    slices = gn.repack_position_slices(grid, statics)
    Pn, Qn, PB, Pb = gn.gnomonic_frame(None, H, W, 140.0, 1.25, statics)
    QB, Qb = gn._qb_blocks(statics, Qn)
    assert QB == 2 and Qb == 128, (Qn, QB, Qb)
    rot_j = jnp.asarray(rotation, jnp.float32)
    origin = jnp.asarray(np.asarray(pose.translation).reshape(3), jnp.float32)
    geo = gn.gnomonic_geometry(rot_j, origin, statics, H, W, 140.0, 1.25)
    cl_s, pn_s = gn.gnomonic_occupancy(slices, geo.Ru, statics, PB, Pb)
    cl_q, pn_q = gn.gnomonic_occupancy(slices, geo.Ru, statics, PB, Pb,
                                       RvT=geo.RvT, QB=QB)
    assert cl_q.shape == (PB, QB, slices.shape[0])
    assert np.all(np.asarray(cl_q.max(axis=1) <= cl_s))
    assert np.all(np.asarray(pn_q.max(axis=1) <= pn_s))
    # and it actually skips more than the stripe grain on this carved scene
    assert float(jnp.sum(pn_q)) < QB * float(jnp.sum(pn_s))

    # the fused path's interval-mask occupancy is a (boundary-tie) SUPERSET of
    # the tent-support flags — skipping stays lossless. It consumes the
    # VERTEX stack (interior positions' density sign is bounded by the union
    # of the two endpoint planes).
    slices_v = gn.repack_position_slices(grid, statics, vertex_only=True)
    cl_l, pn_l, pa_l = gn.gnomonic_occupancy_lite(
        slices_v, geo.geom, statics, Pn, Qn, PB, Pb, QB, Qb
    )
    assert np.all(np.asarray(cl_l) >= np.asarray(cl_q))
    assert np.all(np.asarray(pn_l) >= np.asarray(pn_q))
    assert np.all(np.asarray(pa_l) == np.asarray(pn_l.max(axis=1)))


def test_effective_supersample_floor():
    """The texels-per-voxel floor engages only when the image undersamples the
    grid: production shapes keep the configured supersample; a 64^3 grid at a
    64px image gets >= 2.5 texels/voxel (capped at 4.0)."""
    mk = lambda n: gn.GnomonicStatics(  # noqa: E731
        dims=(n, n, n), aabb=((-1, 1),) * 3, axis=0, flip=False, ncoeff=9,
        relu_sigma=True, with_diffuse=False, pos_per_cell=1, interpret=True,
    )
    # production: 128^3 at 400px -> floor 0.8 < 1.25 -> unchanged
    assert gn.effective_supersample(1.25, mk(128), 400, 400) == 1.25
    # parity scale: 64^3 at 64px -> floor 2.5
    assert gn.effective_supersample(1.25, mk(64), 64, 64) == 2.5
    # explicit larger config wins
    assert gn.effective_supersample(3.0, mk(64), 64, 64) == 3.0
    # cap: 256^3 at a 64px thumbnail would want 10 -> capped at 4
    assert gn.effective_supersample(1.25, mk(256), 64, 64) == 4.0


def test_bspline_prefilter_reconstructs_samples(key):
    """The IIR prefilter must produce coefficients whose B-spline evaluation
    reproduces the input samples EXACTLY — including the first/last rows
    (mirror boundary; a swapped anticausal init fails there with O(1) error)."""
    x = jax.random.normal(key, (40, 3))
    c = np.asarray(gn._bspline_prefilter_axis0(x))
    xn = np.asarray(x)
    rec = (c[:-2] + 4.0 * c[1:-1] + c[2:]) / 6.0
    assert np.max(np.abs(rec - xn[1:-1])) < 1e-5
    rec_first = (c[1] + 4.0 * c[0] + c[1]) / 6.0
    rec_last = (c[-2] + 4.0 * c[-1] + c[-2]) / 6.0
    assert np.max(np.abs(rec_first - xn[0])) < 1e-5
    assert np.max(np.abs(rec_last - xn[-1])) < 1e-5


def test_bspline_warp_close_to_catmull_rom(key):
    """warp_order=5 (prefiltered B-spline interpolation) must stay close to
    the Catmull-Rom warp (same 16 taps, better frequency response) and keep
    the white-background identity via the shared bilinear-hull clamp."""
    grid = _make_grid(key, size=12, post="relu")
    import dataclasses

    coords = jnp.stack(jnp.meshgrid(*[jnp.arange(12)] * 3, indexing="ij"), -1)
    dist = jnp.linalg.norm(coords - 5.5, axis=-1, keepdims=True)
    grid = dataclasses.replace(
        grid, densities=jnp.where(dist < 2.5, grid.densities, -1.0)
    )
    pose = pose_spherical(70.0, -25.0, 3.5)
    intr = CameraIntrinsics(48, 48, 52.0)
    o3 = gn.render_image_gnomonic(
        grid, pose, intr, _config(white_bkgd=True, gnomonic_warp_order=3),
        interpret=True,
    )
    o5 = gn.render_image_gnomonic(
        grid, pose, intr, _config(white_bkgd=True, gnomonic_warp_order=5),
        interpret=True,
    )
    c3, c5 = np.asarray(o3.colour), np.asarray(o5.colour)
    assert np.isfinite(c5).all()
    assert np.max(np.abs(c3 - c5)) < 0.05, np.max(np.abs(c3 - c5))
    # white-bkgd identity: empty pixels stay exactly white under both
    acc5 = np.asarray(o5.extra["accumulated_weight"])
    empty = acc5[..., 0] == 0.0
    assert empty.any()
    assert np.all(c5[empty] == 1.0)
