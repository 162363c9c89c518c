"""Tests for the two-pass scanline-matmul projective warp
(rendering/warp_matmul.py) — the MXU replacement for the gather warp of
gnomonic._warp_to_camera (reference has no warp; this is TPU-architecture
machinery replacing the per-ray sampling of render_interface.py:103-134)."""
import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from thr3ed_atom_tpu.rendering import gnomonic as gn
from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose
from thr3ed_atom_tpu.rendering.warp_matmul import (
    resample_rows,
    warp_state_matmul,
    warp_swap_for_pose,
)
from thr3ed_atom_tpu.utils.camera import pose_spherical


@pytest.mark.parametrize("order", [1, 3, 5])
def test_resample_rows_adjoint_identity(order):
    kx, kp, ky = jax.random.split(jax.random.PRNGKey(0), 3)
    X = jax.random.normal(kx, (8, 8, 256))
    pos = jnp.clip(jax.random.uniform(kp, (8, 1, 128)) * 250 + 2, 2.0, 253.0)
    Y = jax.random.normal(ky, (8, 8, 128))
    out, vjp = jax.vjp(lambda x: resample_rows(x, pos, order, True), X)
    (dX,) = vjp(Y)
    lhs = float(jnp.sum(out * Y))
    rhs = float(jnp.sum(dX * X))
    assert abs(lhs - rhs) <= 1e-4 * max(1.0, abs(lhs))


@pytest.mark.parametrize("order", [1, 3])
def test_resample_rows_reproduces_polynomials(order):
    """Order-1 reproduces affine functions exactly; Catmull-Rom reproduces
    quadratics — on such fields the resample must equal direct evaluation."""
    K = 128
    k = jnp.arange(K, dtype=jnp.float32)
    if order == 1:
        f = lambda t: 0.3 * t - 4.0
    else:
        f = lambda t: 0.01 * t * t - 0.3 * t + 4.0
    X = jnp.broadcast_to(f(k), (8, 8, K)).astype(jnp.float32)
    pos = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(1), (8, 1, 128)) * (K - 4) + 2,
        2.0, K - 3.0,
    )
    out = resample_rows(X, pos, order, True)
    expect = jnp.broadcast_to(f(pos), out.shape)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=0, atol=2e-3)


def _analytic_warp_error(yaw, pitch, order, roll_deg=0.0):
    H = W = 96
    focal = 105.0
    ss = 1.25
    pose = pose_spherical(yaw, pitch, 4.0)
    rot = np.asarray(pose.rotation).reshape(3, 3)
    if roll_deg:
        c, s = np.cos(np.radians(roll_deg)), np.sin(np.radians(roll_deg))
        rot = rot @ np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    axis, flip = dominant_axis_for_pose(rot)

    class _Statics:  # minimal statics surface used by the warp
        pass

    st = _Statics()
    st.axis, st.flip, st.with_diffuse, st.interpret = axis, flip, False, True

    # texel frame mirroring gnomonic_geometry's corner ranges + margin
    Pn = 128
    Qn = 128
    cx = np.array([0.0, W, 0.0, W]); cy = np.array([0.0, 0.0, H, H])
    dirs = np.stack([(cx - W / 2) / focal, -(cy - H / 2) / focal,
                     -np.ones(4)], -1)
    d = dirs @ rot.T
    g = -1.0 if flip else 1.0
    u_ax, v_ax = gn._uv_axes(axis)
    xc = g * d[:, u_ax] / d[:, axis]
    yc = g * d[:, v_ax] / d[:, axis]
    x0, x1 = xc.min(), xc.max()
    y0, y1 = yc.min(), yc.max()
    mx, my = (x1 - x0) / Pn, (y1 - y0) / Qn
    x0, x1, y0, y1 = x0 - mx, x1 + mx, y0 - my, y1 + my

    pp, qq = np.meshgrid(np.arange(Pn), np.arange(Qn), indexing="ij")
    f = lambda p, q: np.sin(p * 0.11) * np.cos(q * 0.13)
    S = np.zeros((6, Pn, Qn), np.float32)
    S[1:6] = f(pp, qq)[None]

    px = np.arange(W) + 0.5
    py = np.arange(H) + 0.5
    gx, gy = np.meshgrid(px, py, indexing="xy")
    dirs = np.stack([(gx - W / 2) / focal, -(gy - H / 2) / focal,
                     -np.ones_like(gx)], -1)
    d = dirs @ rot.T
    x = g * d[..., u_ax] / d[..., axis]
    y = g * d[..., v_ax] / d[..., axis]
    gt = f((x - x0) / (x1 - x0) * (Pn - 1), (y - y0) / (y1 - y0) * (Qn - 1))

    swap = warp_swap_for_pose(rot, axis, flip, H, W, focal)
    out = warp_state_matmul(
        jnp.asarray(S), (jnp.float32(x0), jnp.float32(x1)),
        (jnp.float32(y0), jnp.float32(y1)), jnp.asarray(rot, jnp.float32),
        st, H, W, focal, Pn, Qn, order, swap, True,
    )
    return float(np.sqrt(np.mean((np.asarray(out)[..., 0] - gt) ** 2))), swap


@pytest.mark.parametrize("yaw,pitch", [(45.0, -40.0), (120.0, -5.0)])
def test_matmul_warp_matches_analytic_field(yaw, pitch):
    rms, _ = _analytic_warp_error(yaw, pitch, order=3)
    assert rms < 5e-4, rms


def test_matmul_warp_rolled_camera_swaps_and_stays_accurate():
    """Rolling the camera into the degenerate orientation (image rows nearly
    parallel to the q texel axis — for this diagonal yaw-45 pose that is a
    45-degree roll) must flip the pass order, and accuracy must hold at
    every roll."""
    rms0, swap0 = _analytic_warp_error(45.0, -40.0, order=3, roll_deg=0.0)
    rms45, swap45 = _analytic_warp_error(45.0, -40.0, order=3, roll_deg=45.0)
    rms90, _ = _analytic_warp_error(45.0, -40.0, order=3, roll_deg=90.0)
    assert swap45 != swap0
    assert rms0 < 5e-4 and rms45 < 5e-4 and rms90 < 5e-4


def test_gnomonic_render_matmul_close_to_gather(key):
    """Full gnomonic renders with the two warp implementations agree on a
    smooth scene (different reconstruction bases — not bit-identical)."""
    from make_synthetic_dataset import make_blob_scene

    from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
    from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
    from thr3ed_atom_tpu.utils.camera import CameraBounds, CameraIntrinsics

    grid = make_blob_scene(grid_size=24, seed=3)
    intr = CameraIntrinsics(48, 48, 52.0)
    pose = pose_spherical(45.0, -40.0, 4.0)

    def render(impl):
        cfg = SHVoxGridRenderConfig(
            num_samples_per_ray=32, camera_bounds=CameraBounds(2.0, 6.0),
            perturb_sampled_points=False, white_bkgd=True,
            gnomonic_warp_impl=impl,
        )
        vm = VolumetricModel(
            grid, render_procedure="render_sh_voxel_grid_gnomonic",
            render_config=cfg,
        )
        return np.asarray(vm.render(pose, intr).colour)

    a, b = render("gather"), render("matmul")
    mse = float(np.mean((a - b) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 38.0, psnr


def test_gnomonic_train_step_matmul_warp_reduces_loss(key):
    from make_synthetic_dataset import make_blob_scene

    import optax

    from thr3ed_atom_tpu.rendering.gnomonic_train import (
        gnomonic_train_step,
        make_gnomonic_train_statics,
    )

    grid = make_blob_scene(grid_size=12, seed=3)
    H = W = 32
    pose = pose_spherical(30.0, -35.0, 4.0)
    rot = np.asarray(pose.rotation).reshape(3, 3)
    axis, flip = dominant_axis_for_pose(rot)
    swap = warp_swap_for_pose(rot, axis, flip, H, W, W * 1.1)
    tstat = make_gnomonic_train_statics(
        grid, axis, flip, image_height=H, image_width=W, white_bkgd=True,
        pos_per_cell=1, interpret=True, warp_impl="matmul", warp_swap=swap,
    )
    image = jnp.asarray(
        np.random.default_rng(0).random((H, W, 3), dtype=np.float32)
    )
    tx = optax.adam(0.05)
    opt_state = tx.init(grid)
    losses = []
    for _ in range(6):
        grid, opt_state, metrics = gnomonic_train_step(
            tstat, tx, grid, opt_state, image, jnp.asarray(rot, jnp.float32),
            jnp.asarray(np.asarray(pose.translation), jnp.float32).reshape(3),
            jnp.float32(W * 1.1),
        )
        losses.append(float(metrics["total_loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()
