"""Gnomonic shear-warp prototype v2: fusion-friendly scan body.

Changes vs proto_gnomonic.py (v1 measured 19 ms scan + 5.8 ms warp at 128^3/400^2):
  * matmul2 via dot_general -> [Pn, C, Qn] layout (Qn minor), SH fold as
    broadcast-elementwise (fusable into the matmul epilogue) instead of einsum
  * bf16 intermediates, separable live masks (no [NP, Pn, Qn] table)
  * scan unroll, ybasis laid out [9, Pn, Qn]
Run:  python experiments/proto_gnomonic2.py [grid] [img] [ss] [unroll]
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
from thr3ed_atom_tpu.rendering.bricked import _uv_axes, dominant_axis_for_pose
from thr3ed_atom_tpu.utils.camera import pose_spherical

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 128
IMG = int(sys.argv[2]) if len(sys.argv) > 2 else 400
SS = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
UNROLL = int(sys.argv[4]) if len(sys.argv) > 4 else 8


def geometry(rotation, H, W, focal, ss, axis, flip, u_ax, v_ax):
    g = -1.0 if flip else 1.0
    R = np.asarray(rotation).reshape(3, 3)
    cx = np.array([0.0, W, 0.0, W])
    cy = np.array([0.0, 0.0, H, H])
    dirs_cam = np.stack(
        [(cx - W / 2) / focal, -(cy - H / 2) / focal, -np.ones(4)], axis=-1
    )
    d_world = dirs_cam @ R.T
    x_c = g * d_world[:, u_ax] / d_world[:, axis]
    y_c = g * d_world[:, v_ax] / d_world[:, axis]
    Pn = -(-int(np.ceil(W * ss)) // 8) * 8
    Qn = -(-int(np.ceil(H * ss)) // 128) * 128
    x0, x1 = x_c.min(), x_c.max()
    y0, y1 = y_c.min(), y_c.max()
    mx = (x1 - x0) / Pn
    my = (y1 - y0) / Qn
    return (float(x0 - mx), float(x1 + mx), Pn), (float(y0 - my), float(y1 + my), Qn)


@partial(jax.jit, static_argnames=("statics",))
def gnomonic_render(planes, origin, statics):
    (axis, u_ax, v_ax, g, xspec, yspec, aabb, dims, P, relu_sigma) = statics
    x0, x1, Pn = xspec
    y0, y1, Qn = yspec
    NP = planes.shape[0]
    nu, nv = planes.shape[1], planes.shape[2]
    C = planes.shape[3]
    lo_a, hi_a = aabb[axis]
    cell_a = (hi_a - lo_a) / dims[axis]
    su = dims[u_ax] / (aabb[u_ax][1] - aabb[u_ax][0])
    sv = dims[v_ax] / (aabb[v_ax][1] - aabb[v_ax][0])

    xs = jnp.linspace(x0, x1, Pn, dtype=jnp.float32)
    ys = jnp.linspace(y0, y1, Qn, dtype=jnp.float32)
    norm = jnp.sqrt(1.0 + xs[:, None] ** 2 + ys[None, :] ** 2)  # [Pn, Qn]
    delta = (cell_a / P) * norm

    dx = jnp.zeros((3, Pn, Qn), jnp.float32)
    dx = dx.at[axis].set(g)
    dx = dx.at[u_ax].set(jnp.broadcast_to(xs[:, None], (Pn, Qn)))
    dx = dx.at[v_ax].set(jnp.broadcast_to(ys[None, :], (Pn, Qn)))
    x_, y_, z_ = dx[0] / norm, dx[1] / norm, dx[2] / norm
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
        axis=0,
    )  # [9, Pn, Qn]

    j = jnp.arange(NP, dtype=jnp.float32)
    c_j = (NP - 1 - j) / P if g < 0 else j / P
    w_j = lo_a + (c_j + 0.5) * cell_a
    s_j = (w_j - origin[axis]) / g

    a_u = (origin[u_ax] - aabb[u_ax][0]) * su - 0.5
    a_v = (origin[v_ax] - aabb[v_ax][0]) * sv - 0.5
    U = a_u + (s_j[:, None] * su) * xs[None, :]  # [NP, Pn]
    V = a_v + (s_j[:, None] * sv) * ys[None, :]  # [NP, Qn]

    def tent(pos, n):
        idx = jnp.arange(n, dtype=jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - idx))

    Ru = tent(U, nu).astype(jnp.bfloat16)  # [NP, Pn, nu]
    Rv = tent(V, nv).astype(jnp.bfloat16)  # [NP, Qn, nv]
    live_u = ((U >= -0.5) & (U <= nu - 0.5) & (s_j[:, None] > 0.0)).astype(
        jnp.float32
    )  # [NP, Pn]
    live_v = ((V >= -0.5) & (V <= nv - 0.5)).astype(jnp.float32)  # [NP, Qn]

    def resample_fold(ru, rv, plane, lu, lv):
        # [Pn, nu] @ [nu, nv*C] -> [Pn, nv*C]
        t1 = jax.lax.dot_general(
            ru, plane.reshape(nu, nv * C), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        ).reshape(Pn, nv, C)
        # contract v: [Pn, nv, C] x [Qn, nv] -> [Pn, C, Qn]
        vals = jax.lax.dot_general(
            t1, rv, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [Pn, C, Qn]
        livem = lu[:, None] * lv[None, :]  # [Pn, Qn]
        sigma = vals[:, 27, :] * livem
        sh = vals[:, :27, :].reshape(Pn, 3, 9, Qn)
        # ybasis [9, Pn, Qn] -> broadcast as [Pn, 1, 9, Qn]
        yb = jnp.transpose(ybasis, (1, 0, 2))[:, None]  # [Pn, 1, 9, Qn]
        rgb = jnp.sum(sh * yb, axis=2)  # [Pn, 3, Qn]
        return sigma, rgb

    sig0, rgb0 = resample_fold(Ru[0], Rv[0], planes[0], live_u[0], live_v[0])

    deltaT = jnp.transpose(delta)  # [Qn, Pn] -> keep [Pn, Qn]; use delta as is
    del deltaT

    def step(carry, inp):
        T, col, acc, dep, sig_a, rgb_a = carry
        ru, rv, plane, lu, lv, s_b = inp
        sig_b, rgb_b = resample_fold(ru, rv, plane, lu, lv)
        integ, tbar, _, _ = _relu_trap(sig_a, sig_b, True)
        tbar = jax.lax.stop_gradient(tbar)
        alpha = 1.0 - jnp.exp(-integ * delta)
        mid = jax.nn.sigmoid(
            (1.0 - tbar[:, None]) * rgb_a + tbar[:, None] * rgb_b
        )  # [Pn, 3, Qn]
        w = alpha * T
        col = col + mid * w[:, None]
        acc = acc + w
        s_mid = (s_b - (cell_a / P) + tbar * (cell_a / P)) * norm
        dep = dep + w * s_mid
        return (T * (1.0 - alpha), col, acc, dep, sig_b, rgb_b), None

    init = (
        jnp.ones((Pn, Qn), jnp.float32),
        jnp.zeros((Pn, 3, Qn), jnp.float32),
        jnp.zeros((Pn, Qn), jnp.float32),
        jnp.zeros((Pn, Qn), jnp.float32),
        sig0,
        rgb0,
    )
    (T, col, acc, dep, _, _), _ = jax.lax.scan(
        step,
        init,
        (Ru[1:], Rv[1:], planes[1:], live_u[1:], live_v[1:], s_j[1:]),
        unroll=UNROLL,
    )
    return jnp.transpose(col, (0, 2, 1)), acc, dep  # [Pn, Qn, 3], [Pn, Qn]


@partial(jax.jit, static_argnames=("statics", "H", "W", "focal"))
def warp_to_camera(col, acc, statics, rotation, H, W, focal):
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
    flat = src.reshape(Pn * Qn, 4)

    def gat(dp, dq):
        return jnp.take(flat, (p0 + dp) * Qn + (q0 + dq), axis=0)

    out = (
        gat(0, 0) * ((1 - fp) * (1 - fq))[..., None]
        + gat(1, 0) * (fp * (1 - fq))[..., None]
        + gat(0, 1) * ((1 - fp) * fq)[..., None]
        + gat(1, 1) * (fp * fq)[..., None]
    )
    return out


def main():
    grid = make_blob_scene(grid_size=GRID, seed=3, converged=True)
    H = W = IMG
    focal = IMG * 1.1
    pose = pose_spherical(123.0, -35.0, 4.0)
    rotation = np.asarray(pose.rotation).reshape(3, 3)
    translation = np.asarray(pose.translation).reshape(3)
    P = 1
    axis, flip = dominant_axis_for_pose(rotation)
    u_ax, v_ax = _uv_axes(axis)
    g = -1.0 if flip else 1.0
    xspec, yspec = geometry(rotation, H, W, focal, SS, axis, flip, u_ax, v_ax)
    statics = (
        axis, u_ax, v_ax, g, xspec, yspec,
        tuple((float(a), float(b)) for a, b in grid.aabb),
        tuple(grid.grid_dims), P, True,
    )
    print(f"axis={axis} flip={flip} Pn={xspec[2]} Qn={yspec[2]} unroll={UNROLL}")

    pre_d, pre_f = grid.activated_grids()
    unified = jnp.concatenate([pre_f, pre_d], axis=-1)
    unified = jnp.pad(unified, ((0, 0),) * 3 + ((0, 32 - unified.shape[-1]),))
    planes = jnp.transpose(unified, (axis, u_ax, v_ax, 3))
    if flip:
        planes = jnp.flip(planes, axis=0)
    planes = planes.astype(jnp.bfloat16)
    origin = jnp.asarray(translation, jnp.float32)
    rot_j = jnp.asarray(rotation, jnp.float32)

    col, acc, dep = gnomonic_render(planes, origin, statics)

    # cross-check against v1 (same math, different layout)
    sys.argv = [sys.argv[0]]
    import proto_gnomonic as v1

    v1_statics = statics
    col1, acc1, _ = v1.gnomonic_render(planes, origin, v1_statics)
    d = float(jnp.max(jnp.abs(col - col1)))
    print(f"max |v2 - v1| colour: {d:.2e}")

    def run():
        c, a, d2 = gnomonic_render(planes, origin, statics)
        return warp_to_camera(c, a, statics, rot_j, H, W, focal)

    run()
    best = np.inf
    for _ in range(6):
        t0 = time.perf_counter()
        for _ in range(10):
            o2 = run()
        _ = float(jnp.sum(o2))
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"full render {best * 1e3:7.2f} ms/pose -> {H * W / best / 1e6:7.2f} M rays/s")

    def just_render():
        return gnomonic_render(planes, origin, statics)

    just_render()
    bestr = np.inf
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(10):
            c, a, d2 = just_render()
        _ = float(jnp.sum(c))
        bestr = min(bestr, (time.perf_counter() - t0) / 10)
    print(f"  scan: {bestr * 1e3:7.2f} ms   warp: {(best - bestr) * 1e3:6.2f} ms")


if __name__ == "__main__":
    main()
