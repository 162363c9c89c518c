"""Gnomonic shear-warp v3: XLA batched matmul1 + fused Pallas composite kernel.

Splits the work by what each engine is good at: XLA does the batched
u-resample (t1[j] = Ru_j @ planes_j, laid out [NP, C*Pn, nv] bf16), and a
Pallas kernel streams t1 plane-by-plane, does the v-resample matmul in VMEM,
folds SH, and composites the analytic trapezoid — carries (T, col, acc, depth,
prev plane) live in VMEM scratch across grid steps, so the [C, Pn, Qn] values
NEVER touch HBM (the v2 scan's bottleneck: ~66 MB/plane of HBM traffic).

Run:  python experiments/proto_gnomonic3.py [grid] [img] [ss]
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from make_synthetic_dataset import make_blob_scene
from thr3ed_atom_tpu.ops.pallas.plane_march import _relu_trap
from thr3ed_atom_tpu.rendering.bricked import _uv_axes, dominant_axis_for_pose
from thr3ed_atom_tpu.utils.camera import pose_spherical

GRID = int(sys.argv[1]) if len(sys.argv) > 1 else 128
IMG = int(sys.argv[2]) if len(sys.argv) > 2 else 400
SS = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25

import proto_gnomonic2 as v2  # geometry + reference scan


def make_composite_kernel(NP, Pn, Qn, nv, C, cell_step):
    """Kernel: grid=(NP,); composites plane j against plane j-1."""

    def kernel(geom_ref, t1_ref, rvt_ref, yb_ref, lu_ref, lv_ref, norm_ref,
               out_ref, prev_ref, state_ref):
        j = pl.program_id(0)
        # v-resample: [C*Pn, nv] @ [nv, Qn] -> f32 [C*Pn, Qn]
        vals = jnp.dot(
            t1_ref[0], rvt_ref[0], preferred_element_type=jnp.float32
        )
        livem = lu_ref[0] * lv_ref[0]  # [Pn, 1] * [1, Qn] -> [Pn, Qn]
        sig = vals[27 * Pn:28 * Pn, :] * livem
        rgb = []
        for c in range(3):
            acc = yb_ref[0:Pn] * vals[(c * 9) * Pn:(c * 9 + 1) * Pn]
            for k in range(1, 9):
                acc += (
                    yb_ref[k * Pn:(k + 1) * Pn]
                    * vals[(c * 9 + k) * Pn:(c * 9 + k + 1) * Pn]
                )
            rgb.append(acc)

        @pl.when(j == 0)
        def _():
            state_ref[...] = jnp.zeros_like(state_ref)
            state_ref[0:Pn, :] = jnp.ones((Pn, Qn), jnp.float32)  # T

        @pl.when(j > 0)
        def _():
            sig_a = prev_ref[0:Pn, :]
            integ, tbar, _, _ = _relu_trap(sig_a, sig, True)
            delta = cell_step * norm_ref[...]
            alpha = 1.0 - jnp.exp(-integ * delta)
            T = state_ref[0:Pn, :]
            w = alpha * T
            s_b = geom_ref[j, 0]
            s_mid = (s_b - cell_step + tbar * cell_step) * norm_ref[...]
            tb1 = 1.0 - tbar
            for c in range(3):
                mraw = tb1 * prev_ref[(1 + c) * Pn:(2 + c) * Pn, :] + tbar * rgb[c]
                mid = jax.nn.sigmoid(mraw)
                state_ref[(1 + c) * Pn:(2 + c) * Pn, :] += mid * w
            state_ref[4 * Pn:5 * Pn, :] += w
            state_ref[5 * Pn:6 * Pn, :] += w * s_mid
            state_ref[0:Pn, :] = T * (1.0 - alpha)

        prev_ref[0:Pn, :] = sig
        for c in range(3):
            prev_ref[(1 + c) * Pn:(2 + c) * Pn, :] = rgb[c]

        @pl.when(j == NP - 1)
        def _():
            out_ref[...] = state_ref[...]

    return kernel


@partial(jax.jit, static_argnames=("statics",))
def gnomonic_render_v3(planes, origin, statics):
    (axis, u_ax, v_ax, g, xspec, yspec, aabb, dims, P, relu_sigma) = statics
    x0, x1, Pn = xspec
    y0, y1, Qn = yspec
    NP, nu, nv, C = planes.shape
    lo_a, hi_a = aabb[axis]
    cell_a = (hi_a - lo_a) / dims[axis]
    su = dims[u_ax] / (aabb[u_ax][1] - aabb[u_ax][0])
    sv = dims[v_ax] / (aabb[v_ax][1] - aabb[v_ax][0])

    xs = jnp.linspace(x0, x1, Pn, dtype=jnp.float32)
    ys = jnp.linspace(y0, y1, Qn, dtype=jnp.float32)
    norm = jnp.sqrt(1.0 + xs[:, None] ** 2 + ys[None, :] ** 2)

    dirs = [None, None, None]
    nrm_x = xs[:, None] / norm
    nrm_y = jnp.broadcast_to(ys[None, :], (Pn, Qn)) / norm
    nrm_g = g / norm
    dirs[u_ax] = nrm_x
    dirs[v_ax] = nrm_y
    dirs[axis] = nrm_g
    x_, y_, z_ = dirs
    ybasis = jnp.concatenate(
        [
            0.28209479177387814 * jnp.ones((Pn, Qn), jnp.float32),
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
    )  # [9*Pn, Qn]

    j = jnp.arange(NP, dtype=jnp.float32)
    c_j = (NP - 1 - j) / P if g < 0 else j / P
    w_j = lo_a + (c_j + 0.5) * cell_a
    s_j = (w_j - origin[axis]) / g

    a_u = (origin[u_ax] - aabb[u_ax][0]) * su - 0.5
    a_v = (origin[v_ax] - aabb[v_ax][0]) * sv - 0.5
    U = a_u + (s_j[:, None] * su) * xs[None, :]
    V = a_v + (s_j[:, None] * sv) * ys[None, :]

    def tent(pos, n):
        idx = jnp.arange(n, dtype=jnp.float32)
        return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - idx))

    Ru = tent(U, nu).astype(jnp.bfloat16)  # [NP, Pn, nu]
    RvT = jnp.swapaxes(tent(V, nv), 1, 2).astype(jnp.bfloat16)  # [NP, nv, Qn]
    live_u = ((U >= -0.5) & (U <= nu - 0.5) & (s_j[:, None] > 0.0)).astype(
        jnp.float32
    )[..., None]  # [NP, Pn, 1]
    live_v = ((V >= -0.5) & (V <= nv - 0.5)).astype(jnp.float32)[:, None, :]

    # m1 (XLA): [NP, C*Pn, nv] bf16
    t1 = jnp.einsum(
        "jpu,jucv->jcpv",
        Ru,
        planes.transpose(0, 1, 3, 2),
        preferred_element_type=jnp.bfloat16,
    ).reshape(NP, C * Pn, nv)

    geom = jnp.stack([s_j] + [jnp.zeros_like(s_j)] * 7, axis=-1)  # [NP, 8]

    kernel = make_composite_kernel(NP, Pn, Qn, nv, C, cell_a / P)
    out = pl.pallas_call(
        kernel,
        grid=(NP,),
        in_specs=[
            pl.BlockSpec((NP, 8), lambda t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C * Pn, nv), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, nv, Qn), lambda t: (t, 0, 0)),
            pl.BlockSpec((9 * Pn, Qn), lambda t: (0, 0)),
            pl.BlockSpec((1, Pn, 1), lambda t: (t, 0, 0)),
            pl.BlockSpec((1, 1, Qn), lambda t: (t, 0, 0)),
            pl.BlockSpec((Pn, Qn), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((6 * Pn, Qn), lambda t: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((6 * Pn, Qn), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((4 * Pn, Qn), jnp.float32),
            pltpu.VMEM((6 * Pn, Qn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
    )(geom, t1, RvT, ybasis, live_u, live_v, norm)

    col = jnp.stack([out[Pn:2 * Pn], out[2 * Pn:3 * Pn], out[3 * Pn:4 * Pn]], -1)
    acc = out[4 * Pn:5 * Pn]
    dep = out[5 * Pn:6 * Pn]
    return col, acc, dep



def profile_split(planes, origin, statics):
    """Split timing: m1 einsum alone vs kernel."""
    import jax
    (axis, u_ax, v_ax, g, xspec, yspec, aabb, dims, P, relu_sigma) = statics
    x0, x1, Pn = xspec
    NP, nu, nv, C = planes.shape
    lo_a, hi_a = aabb[axis]
    cell_a = (hi_a - lo_a) / dims[axis]
    su = dims[u_ax] / (aabb[u_ax][1] - aabb[u_ax][0])

    @jax.jit
    def m1_only(planes, origin):
        xs = jnp.linspace(x0, x1, Pn, dtype=jnp.float32)
        j = jnp.arange(NP, dtype=jnp.float32)
        c_j = (NP - 1 - j) / P if g < 0 else j / P
        w_j = lo_a + (c_j + 0.5) * cell_a
        s_j = (w_j - origin[axis]) / g
        a_u = (origin[u_ax] - aabb[u_ax][0]) * su - 0.5
        U = a_u + (s_j[:, None] * su) * xs[None, :]
        idx = jnp.arange(nu, dtype=jnp.float32)
        Ru = jnp.maximum(0.0, 1.0 - jnp.abs(U[..., None] - idx)).astype(jnp.bfloat16)
        return jnp.einsum(
            "jpu,jucv->jcpv", Ru, planes.transpose(0, 1, 3, 2),
            preferred_element_type=jnp.bfloat16,
        ).reshape(NP, C * Pn, nv)

    import numpy as _np
    m1_only(planes, origin)
    best = _np.inf
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(10):
            t1 = m1_only(planes, origin)
        _ = float(jnp.sum(t1[0, :8, :8].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / 10)
    print(f"  m1 alone: {best * 1e3:7.2f} ms")



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
    xspec, yspec = v2.geometry(rotation, H, W, focal, SS, axis, flip, u_ax, v_ax)
    statics = (
        axis, u_ax, v_ax, g, xspec, yspec,
        tuple((float(a), float(b)) for a, b in grid.aabb),
        tuple(grid.grid_dims), P, True,
    )
    print(f"axis={axis} flip={flip} Pn={xspec[2]} Qn={yspec[2]}")

    pre_d, pre_f = grid.activated_grids()
    unified = jnp.concatenate([pre_f, pre_d], axis=-1)
    unified = jnp.pad(unified, ((0, 0),) * 3 + ((0, 32 - unified.shape[-1]),))
    planes = jnp.transpose(unified, (axis, u_ax, v_ax, 3))
    if flip:
        planes = jnp.flip(planes, axis=0)
    planes = planes.astype(jnp.bfloat16)
    origin = jnp.asarray(translation, jnp.float32)
    rot_j = jnp.asarray(rotation, jnp.float32)

    col3, acc3, dep3 = gnomonic_render_v3(planes, origin, statics)
    col2, acc2, dep2 = v2.gnomonic_render(planes, origin, statics)
    d = float(jnp.max(jnp.abs(col3 - col2)))
    da = float(jnp.max(jnp.abs(acc3 - acc2)))
    print(f"max |v3 - v2|: colour {d:.2e}  acc {da:.2e}")

    def run():
        c, a, d2 = gnomonic_render_v3(planes, origin, statics)
        return v2.warp_to_camera(c, a, statics, rot_j, H, W, focal)

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
        return gnomonic_render_v3(planes, origin, statics)

    just_render()
    bestr = np.inf
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(10):
            c, a, d2 = just_render()
        _ = float(jnp.sum(c))
        bestr = min(bestr, (time.perf_counter() - t0) / 10)
    print(f"  m1+kernel: {bestr * 1e3:7.2f} ms   warp: {(best - bestr) * 1e3:6.2f} ms")
    profile_split(planes, origin, statics)


if __name__ == "__main__":
    main()
