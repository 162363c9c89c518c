"""Prototype: dense gnomonic shear-warp renderer (round-3 throughput candidate).

Formulation: resample each march-axis vertex plane of the grid onto a per-pose
"virtual axis-aligned camera" (gnomonic) texel grid with two banded-matrix
matmuls (pure MXU work, no gathers), composite the analytic relu-trapezoid
front-to-back in a lax.scan over planes, then warp the composited image to the
real camera with one projective bilinear resample.

Texel (p, q) of the gnomonic grid IS a real ray through the camera center with
direction D = g*e_axis + x_p*e_u + y_q*e_v (g = -1 when flipped), so the
composited intermediate image is an EXACT plane-march render of those rays; the
only approximation vs per-pixel marching is the final 2D warp.

Validates numerics vs the jnp trapezoid oracle at gnomonic rays (must match to
f32/bf16 precision), measures end-to-end PSNR of the warped image vs per-pixel
oracle rendering, and times the jitted pipeline on the current backend.

Run:  python experiments/proto_gnomonic.py [grid_size] [image_size] [supersample]
"""
import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import jax
import jax.numpy as jnp
import numpy as np

from make_synthetic_dataset import make_blob_scene
from thr3ed_atom_tpu.ops.pallas.plane_march import _relu_trap
from thr3ed_atom_tpu.ops.sh import evaluate_spherical_harmonics
from thr3ed_atom_tpu.rendering.bricked import _uv_axes, dominant_axis_for_pose
from thr3ed_atom_tpu.utils.camera import CameraIntrinsics, pose_spherical

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 128
IMG = int(sys.argv[2]) if len(sys.argv) > 2 else 400
SS = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25


def geometry(grid, rotation, translation, H, W, focal, ss):
    """Static per-pose gnomonic geometry (numpy, outside jit)."""
    axis, flip = dominant_axis_for_pose(rotation)
    u_ax, v_ax = _uv_axes(axis)
    g = -1.0 if flip else 1.0
    R = np.asarray(rotation).reshape(3, 3)
    o = np.asarray(translation).reshape(3)

    # gnomonic coords of the image corners: x = g * d_u / d_a
    cx = np.array([0.0, W, 0.0, W])
    cy = np.array([0.0, 0.0, H, H])
    dirs_cam = np.stack(
        [(cx - W / 2) / focal, -(cy - H / 2) / focal, -np.ones(4)], axis=-1
    )
    d_world = dirs_cam @ R.T
    x_c = g * d_world[:, u_ax] / d_world[:, axis]
    y_c = g * d_world[:, v_ax] / d_world[:, axis]
    # margin of one texel step for the warp's bilinear footprint
    Pn = int(np.ceil(W * ss))
    Qn = int(np.ceil(H * ss))
    x0, x1 = x_c.min(), x_c.max()
    y0, y1 = y_c.min(), y_c.max()
    mx = (x1 - x0) / Pn
    my = (y1 - y0) / Qn
    x0, x1 = x0 - mx, x1 + mx
    y0, y1 = y0 - my, y1 + my
    return axis, flip, u_ax, v_ax, g, (x0, x1, Pn), (y0, y1, Qn)


@partial(jax.jit, static_argnames=("statics",))
def gnomonic_render(planes, origin, statics):
    """planes [NP, nu, nv, 32] bf16 (27 SH + sigma + pad, pre-activated,
    front-to-back along the march); origin [3] world camera center."""
    (axis, u_ax, v_ax, g, xspec, yspec, aabb, dims, P, relu_sigma) = statics
    x0, x1, Pn = xspec
    y0, y1, Qn = yspec
    NP = planes.shape[0]
    nu, nv = planes.shape[1], planes.shape[2]
    lo_a, hi_a = aabb[axis]
    cell_a = (hi_a - lo_a) / dims[axis]
    su = dims[u_ax] / (aabb[u_ax][1] - aabb[u_ax][0])
    sv = dims[v_ax] / (aabb[v_ax][1] - aabb[v_ax][0])

    xs = jnp.linspace(x0, x1, Pn, dtype=jnp.float32)  # [Pn]
    ys = jnp.linspace(y0, y1, Qn, dtype=jnp.float32)  # [Qn]

    # world depth (in units of the UNIT-norm ray) per position step, per texel
    norm = jnp.sqrt(1.0 + xs[:, None] ** 2 + ys[None, :] ** 2)  # [Pn, Qn]
    delta = (cell_a / P) * norm

    # SH basis of the texel directions (unit)
    dirs = jnp.zeros((Pn, Qn, 3), jnp.float32)
    dirs = dirs.at[..., axis].set(g)
    dirs = dirs.at[..., u_ax].set(xs[:, None])
    dirs = dirs.at[..., v_ax].set(ys[None, :])
    dirs = dirs / norm[..., None]
    # evaluate degree-2 basis via the library (coeff identity trick): y_k =
    # eval(sh with coeffs e_k). cheaper: inline the polynomial ladder
    x_, y_, z_ = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    ybasis = jnp.stack(
        [
            0.28209479177387814 * jnp.ones_like(x_),
            -0.4886025119029199 * y_,
            0.4886025119029199 * z_,
            -0.4886025119029199 * x_,
            1.0925484305920792 * x_ * y_,
            -1.0925484305920792 * y_ * z_,
            0.31539156525252005 * (2.0 * z_ * z_ - x_ * x_ - y_ * y_),
            -1.0925484305920792 * x_ * z_,
            0.5462742152960396 * (x_ * x_ - y_ * y_),
        ],
        axis=-1,
    )  # [Pn, Qn, 9]

    # per-plane world depth s_j (scalar): position j at world lo_a+(c_j+0.5)cell
    j = jnp.arange(NP, dtype=jnp.float32)
    c_j = (NP - 1 - j) / P if g < 0 else j / P
    w_j = lo_a + (c_j + 0.5) * cell_a
    s_j = (w_j - origin[axis]) / g  # increasing, in units of D (D_axis = g)

    # u position of texel p at plane j: (o_u + s_j * x_p - lo_u) * su - 0.5
    a_u = (origin[u_ax] - aabb[u_ax][0]) * su - 0.5
    a_v = (origin[v_ax] - aabb[v_ax][0]) * sv - 0.5
    U = a_u + (s_j[:, None] * su) * xs[None, :]  # [NP, Pn]
    V = a_v + (s_j[:, None] * sv) * ys[None, :]  # [NP, Qn]

    def tent(pos, n):
        # [..., n] tents; zero outside [0, n-1] (border handling: a crossing in
        # the half-texel margin keeps partial weight = border-clamped-ish)
        idx = jnp.arange(n, dtype=jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - idx))

    Ru = tent(U, nu).astype(jnp.bfloat16)  # [NP, Pn, nu]
    Rv = tent(V, nv).astype(jnp.bfloat16)  # [NP, Qn, nv]
    live = (
        (U >= -0.5) & (U <= nu - 0.5)
    )[:, :, None] & ((V >= -0.5) & (V <= nv - 0.5))[:, None, :]  # [NP, Pn, Qn]
    live = live & (s_j[:, None, None] > 0.0)

    def resample(ru, rv, plane):
        t1 = jax.lax.dot_general(
            ru, plane.reshape(nu, nv * 32),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(Pn, nv, 32)
        vals = jnp.einsum(
            "qv,pvc->pqc", rv, t1.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        return vals  # [Pn, Qn, 32]

    def fold(vals, live_j):
        sigma = jnp.where(live_j, vals[..., 27], 0.0)
        rgb = jnp.einsum(
            "pqk,pqck->pqc", ybasis, vals[..., :27].reshape(Pn, Qn, 3, 9)
        )
        return sigma, rgb

    vals0 = resample(Ru[0], Rv[0], planes[0])
    sig0, rgb0 = fold(vals0, live[0])

    def step(carry, inp):
        T, col, acc, dep, sig_a, rgb_a = carry
        ru, rv, plane, live_j, s_b = inp
        vals = resample(ru, rv, plane)
        sig_b, rgb_b = fold(vals, live_j)
        integ, tbar, _, _ = _relu_trap(sig_a, sig_b, True)
        tbar = jax.lax.stop_gradient(tbar)
        alpha = jnp.clip(1.0 - jnp.exp(-integ * delta), 0.0, 1.0)
        mid = jax.nn.sigmoid(
            (1.0 - tbar[..., None]) * rgb_a + tbar[..., None] * rgb_b
        )
        w = alpha * T
        col = col + mid * w[..., None]
        acc = acc + w
        s_mid = (s_b - (cell_a / P) + tbar * (cell_a / P)) * norm
        dep = dep + w * s_mid
        return (T * (1.0 - alpha), col, acc, dep, sig_b, rgb_b), None

    init = (
        jnp.ones((Pn, Qn), jnp.float32),
        jnp.zeros((Pn, Qn, 3), jnp.float32),
        jnp.zeros((Pn, Qn), jnp.float32),
        jnp.zeros((Pn, Qn), jnp.float32),
        sig0,
        rgb0,
    )
    (T, col, acc, dep, _, _), _ = jax.lax.scan(
        step, init, (Ru[1:], Rv[1:], planes[1:], live[1:], s_j[1:])
    )
    return col, acc, dep  # [Pn, Qn, ...] gnomonic-space


@partial(jax.jit, static_argnames=("statics", "H", "W", "focal"))
def warp_to_camera(col, acc, statics, rotation, H, W, focal):
    """Projective bilinear warp gnomonic -> camera pixels."""
    (axis, u_ax, v_ax, g, xspec, yspec, *_rest) = statics
    x0, x1, Pn = xspec
    y0, y1, Qn = yspec
    px = jnp.arange(W, dtype=jnp.float32) + 0.5
    py = jnp.arange(H, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(px, py, indexing="xy")
    dirs_cam = jnp.stack(
        [(gx - W / 2) / focal, -(gy - H / 2) / focal, -jnp.ones_like(gx)], axis=-1
    )
    d = jnp.einsum("ij,hwj->hwi", rotation, dirs_cam)
    x = g * d[..., u_ax] / d[..., axis]
    y = g * d[..., v_ax] / d[..., axis]
    p = (x - x0) / (x1 - x0) * (Pn - 1)
    q = (y - y0) / (y1 - y0) * (Qn - 1)
    p0 = jnp.clip(jnp.floor(p), 0, Pn - 2).astype(jnp.int32)
    q0 = jnp.clip(jnp.floor(q), 0, Qn - 2).astype(jnp.int32)
    fp = p - p0
    fq = q - q0
    src = jnp.concatenate([col, acc[..., None]], axis=-1)  # [Pn, Qn, 4]

    def gat(dp, dq):
        return src[p0 + dp, q0 + dq]

    out = (
        gat(0, 0) * ((1 - fp) * (1 - fq))[..., None]
        + gat(1, 0) * (fp * (1 - fq))[..., None]
        + gat(0, 1) * ((1 - fp) * fq)[..., None]
        + gat(1, 1) * (fp * fq)[..., None]
    )
    return out  # [H, W, 4]


def oracle_at_dirs(grid, origin, dirs, P, axis, flip):
    """jnp trapezoid oracle at explicit unit-ish rays (adapted from
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
    sh = feats.reshape(*s.shape, 3, 9)
    raw_rgb = evaluate_spherical_harmonics(2, sh, viewdirs[:, None, :])
    a_s, b_s = sigma[:, :-1], sigma[:, 1:]
    integ, tbar, _, _ = _relu_trap(a_s, b_s, True)
    cell_live = valid[:, :-1] & valid[:, 1:]
    integ = jnp.where(cell_live, integ, 0.0)
    delta = jnp.abs(s[:, 1:2] - s[:, 0:1]) * jnp.linalg.norm(d, axis=-1, keepdims=True)
    alpha = jnp.clip(1.0 - jnp.exp(-integ * delta), 0.0, 1.0)
    tb = tbar[..., None]
    mid = jax.nn.sigmoid((1.0 - tb) * raw_rgb[:, :-1] + tb * raw_rgb[:, 1:])
    trans = jnp.cumprod(1.0 - alpha, axis=-1)
    excl = jnp.concatenate([jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
    w = alpha * excl
    colour = jnp.sum(mid * w[..., None], axis=1)
    acc = jnp.sum(w, axis=1, keepdims=True)
    return colour, acc


def main():
    grid = make_blob_scene(grid_size=GRID, seed=3, converged=True)
    H = W = IMG
    focal = IMG * 1.1
    pose = pose_spherical(123.0, -35.0, 4.0)
    rotation = np.asarray(pose.rotation).reshape(3, 3)
    translation = np.asarray(pose.translation).reshape(3)
    P = 1

    axis, flip, u_ax, v_ax, g, xspec, yspec = geometry(
        grid, rotation, translation, H, W, focal, SS
    )
    statics = (
        axis, u_ax, v_ax, g, xspec, yspec,
        tuple((float(a), float(b)) for a, b in grid.aabb),
        tuple(grid.grid_dims), P, True,
    )
    print(f"axis={axis} flip={flip} Pn={xspec[2]} Qn={yspec[2]}")

    # repack planes: [NP, nu, nv, 32] bf16 front-to-back
    pre_d, pre_f = grid.activated_grids()
    unified = jnp.concatenate([pre_f, pre_d], axis=-1)
    unified = jnp.pad(unified, ((0, 0),) * 3 + ((0, 32 - unified.shape[-1]),))
    planes = jnp.transpose(unified, (axis, u_ax, v_ax, 3))
    if flip:
        planes = jnp.flip(planes, axis=0)
    planes = planes.astype(jnp.bfloat16)

    origin = jnp.asarray(translation, jnp.float32)
    col, acc, dep = gnomonic_render(planes, origin, statics)
    col = np.asarray(col)

    # --- numerics: oracle at a subsample of gnomonic texel rays
    x0, x1, Pn = xspec
    y0, y1, Qn = yspec
    xs = np.linspace(x0, x1, Pn)
    ys = np.linspace(y0, y1, Qn)
    ps = np.arange(8, Pn - 8, Pn // 24)
    qs = np.arange(8, Qn - 8, Qn // 24)
    pg, qg = np.meshgrid(ps, qs, indexing="ij")
    dirs = np.zeros((pg.size, 3), np.float32)
    dirs[:, axis] = g
    dirs[:, u_ax] = xs[pg.ravel()]
    dirs[:, v_ax] = ys[qg.ravel()]
    oc, oa = oracle_at_dirs(grid, translation, jnp.asarray(dirs), P, axis, flip)
    oc = np.asarray(oc)
    gc = col[pg.ravel(), qg.ravel()]
    err = np.abs(gc - oc)
    mse = float(np.mean((gc - oc) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    print(f"gnomonic texels vs oracle: max|err| {err.max():.4e}  psnr {psnr:.1f} dB")

    # --- end-to-end: warp -> camera, vs per-pixel oracle
    rot_j = jnp.asarray(rotation, jnp.float32)
    out = warp_to_camera(col, jnp.asarray(acc), statics, rot_j, H, W, focal)
    out = np.asarray(out)
    # per-pixel oracle (chunked)
    px = np.arange(W) + 0.5
    py = np.arange(H) + 0.5
    gx, gy = np.meshgrid(px, py, indexing="xy")
    dcam = np.stack(
        [(gx - W / 2) / focal, -(gy - H / 2) / focal, -np.ones_like(gx)], -1
    )
    dw = dcam @ rotation.T
    step = 7
    sel = dw[::step, ::step].reshape(-1, 3)
    oc2, _ = oracle_at_dirs(grid, translation, jnp.asarray(sel), P, axis, flip)
    oc2 = np.asarray(oc2)
    wc = out[::step, ::step, :3].reshape(-1, 3)
    mse2 = float(np.mean((wc - oc2) ** 2))
    psnr2 = 10 * np.log10(1.0 / max(mse2, 1e-12))
    print(f"warped pixels vs per-pixel oracle: psnr {psnr2:.1f} dB")

    # --- timing
    def run():
        c, a, d2 = gnomonic_render(planes, origin, statics)
        return warp_to_camera(c, a, statics, rot_j, H, W, focal)

    run()
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(10):
            o2 = run()
        _ = float(jnp.sum(o2))
        best = min(best, (time.perf_counter() - t0) / 10)
    rays = H * W
    print(
        f"full render {best * 1e3:7.2f} ms/pose -> {rays / best / 1e6:7.2f} M rays/s"
    )

    # component timing
    def just_render():
        return gnomonic_render(planes, origin, statics)

    just_render()
    bestr = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            c, a, d2 = just_render()
        _ = float(jnp.sum(c))
        bestr = min(bestr, (time.perf_counter() - t0) / 10)
    print(f"  gnomonic scan: {bestr * 1e3:7.2f} ms   warp: {(best - bestr) * 1e3:6.2f} ms")


if __name__ == "__main__":
    main()
