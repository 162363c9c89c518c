"""Scene-level quadrature validation: slab-crossing composites vs exact @1024spp.

Renders a converged blob scene with the EXACT renderer at 1024 spp (the
production-gate oracle, tests/test_production_quality.py), then re-renders the
same rays with jnp-level slab marching at the bricked kernel's sample positions:

  K=1      one true trilinear sample per cell (cell centers)
  K=2      samples at 0.25/0.75 per cell (round-2 quality default)
  trap     analytic trapezoid of relu(linear lerp of PLANE-crossing values),
           sigma-weighted colour centroid (round-3 candidate, ~K=1 cost)
  split    planes + centers, piecewise trapezoid per half-cell (~K=2 cost)

Run on TPU or CPU:  python experiments/quality_trapezoid_scene.py [grid_size]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import jax
import jax.numpy as jnp
import numpy as np

from make_synthetic_dataset import make_blob_scene
from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
from thr3ed_atom_tpu.ops.grid_sample import trilinear_grid_sample
from thr3ed_atom_tpu.ops.sh import evaluate_spherical_harmonics
from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose
from thr3ed_atom_tpu.rendering.rays import cast_rays, flatten_rays
from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
from thr3ed_atom_tpu.utils.camera import (
    CameraBounds,
    CameraIntrinsics,
    pose_spherical,
)

IMG = 160


def psnr(a, b):
    mse = float(jnp.mean((a - b) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


def sample_raw(grid, points):
    """RAW (pre-postactivation) interpolated [N, F+1] at world points; outside
    the AABB densities are forced hard-negative and features zero."""
    pre_d, pre_f = grid.activated_grids()
    unified = jnp.concatenate([pre_f, pre_d], axis=-1)
    vals = trilinear_grid_sample(unified, grid.normalize_points(points))
    inside = grid.test_inside_volume(points)
    feats = jnp.where(inside, vals[..., :-1], 0.0)
    dens = jnp.where(inside, vals[..., -1:], -1e6)
    return feats, dens[..., 0]


def shade(feats, dirs):
    """[N, S, 27] SH feats + [N, 3] dirs -> raw rgb [N, S, 3]."""
    n, s, _ = feats.shape
    sh = feats.reshape(n, s, 3, 9)
    d = jnp.broadcast_to(dirs[:, None, :], (n, s, 3))
    return evaluate_spherical_harmonics(2, sh, d)


def fb_composite(alpha, cols, depths, white=True):
    T = jnp.cumprod(1.0 - alpha + 1e-12, axis=1)
    T = jnp.concatenate([jnp.ones_like(T[:, :1]), T[:, :-1]], axis=1)
    w = alpha * T
    col = (w[..., None] * cols).sum(1)
    acc = w.sum(1)
    if white:
        col = col + (1.0 - acc)[..., None]
    return col


def relu_trap(a, b):
    p = jnp.maximum(a, 0.0)
    q = jnp.maximum(b, 0.0)
    s = a - b
    safe = jnp.where(jnp.abs(s) > 1e-9, s, 1.0)
    integ = jnp.where(
        jnp.abs(s) > 1e-9, (p * p - q * q) / (2.0 * safe), 0.5 * (p + q)
    )
    ts = jnp.clip(a / safe, 0.0, 1.0)

    def F(t):
        return a * t * t / 2.0 + (b - a) * t**3 / 3.0

    num = jnp.where((a >= 0) & (b >= 0), F(1.0),
                    jnp.where(a > b, F(ts), F(1.0) - F(ts)))
    num = jnp.where((a <= 0) & (b <= 0), 0.0, num)
    tbar = jnp.clip(num / jnp.maximum(integ, 1e-9), 0.0, 1.0)
    return integ, tbar


def main(grid_size=64):
    grid = make_blob_scene(grid_size=grid_size, seed=3, converged=True)
    config = SHVoxGridRenderConfig(
        num_samples_per_ray=1024,
        camera_bounds=CameraBounds(2.0, 6.0),
        perturb_sampled_points=False,
        white_bkgd=True,
        parallel_rays_chunk_size=4096,
    )
    vol_mod = VolumetricModel(grid, "render_sh_voxel_grid", config)
    intr = CameraIntrinsics(IMG, IMG, IMG * 1.1)

    for yaw, pitch in ((30.0, -30.0), (120.0, -5.0), (275.0, -60.0)):
        pose = pose_spherical(yaw, pitch, 4.0)
        t0 = time.time()
        oracle = np.asarray(vol_mod.render(pose, intr).colour)
        t_oracle = time.time() - t0

        rays = flatten_rays(cast_rays(intr, pose))
        o = np.asarray(rays.origins)
        d = np.asarray(rays.directions)
        rot = np.asarray(pose.rotation).reshape(3, 3)
        axis, flip = dominant_axis_for_pose(rot)
        aabb = grid.aabb
        lo, hi = aabb[axis]
        dims = grid.grid_dims
        inv_scale = (hi - lo) / dims[axis]
        S = dims[axis]  # vertex planes

        d_a = np.where(np.abs(d[:, axis]) < 1e-12, 1e-12, d[:, axis])
        # vertex plane i at world lo + (i + 0.5) * inv_scale
        order = np.arange(S)[::-1] if flip else np.arange(S)
        w_planes = lo + (order + 0.5) * inv_scale  # front-to-back
        t_planes = (w_planes[None, :] - o[:, axis:axis + 1]) / d_a[:, None]
        delta = np.abs(inv_scale / d_a) * np.linalg.norm(d, axis=-1)  # [N]

        oj = jnp.asarray(o)
        dj = jnp.asarray(d)
        dirs_unit = dj / jnp.linalg.norm(dj, axis=-1, keepdims=True)

        def values_at(tq):  # [N, M] -> feats [N, M, 27], sig [N, M]
            pts = oj[:, None, :] + jnp.asarray(tq)[..., None] * dj[:, None, :]
            f, s = sample_raw(grid, pts.reshape(-1, 3))
            return (
                f.reshape(tq.shape + (27,)),
                s.reshape(tq.shape),
            )

        t_cent = 0.5 * (t_planes[:, :-1] + t_planes[:, 1:])  # cell centers
        dl = jnp.asarray(delta)[:, None]

        results = {}
        f1, s1 = values_at(t_cent)
        a1 = jnp.clip(1 - jnp.exp(-jnp.maximum(s1, 0) * dl), 0, 1)
        results["K=1"] = fb_composite(
            a1, jax.nn.sigmoid(shade(f1, dirs_unit)), None
        )

        tq2 = np.stack(
            [0.75 * t_planes[:, :-1] + 0.25 * t_planes[:, 1:],
             0.25 * t_planes[:, :-1] + 0.75 * t_planes[:, 1:]], axis=2
        ).reshape(len(o), -1)
        f2, s2 = values_at(tq2)
        a2 = jnp.clip(1 - jnp.exp(-jnp.maximum(s2, 0) * dl * 0.5), 0, 1)
        results["K=2"] = fb_composite(
            a2, jax.nn.sigmoid(shade(f2, dirs_unit)), None
        )

        fp, sp = values_at(t_planes)
        rawp = shade(fp, dirs_unit)
        integ, tbar = relu_trap(sp[:, :-1], sp[:, 1:])
        at = jnp.clip(1 - jnp.exp(-integ * dl), 0, 1)
        cmid = (1 - tbar[..., None]) * rawp[:, :-1] + tbar[..., None] * rawp[:, 1:]
        results["trap"] = fb_composite(at, jax.nn.sigmoid(cmid), None)

        # split: planes + centers, trapezoid per half cell
        i1, tb1 = relu_trap(sp[:, :-1], s1)
        i2, tb2 = relu_trap(s1, sp[:, 1:])
        raw1 = shade(f1, dirs_unit)
        asub = jnp.stack(
            [jnp.clip(1 - jnp.exp(-i1 * dl * 0.5), 0, 1),
             jnp.clip(1 - jnp.exp(-i2 * dl * 0.5), 0, 1)], axis=2
        ).reshape(len(o), -1)
        c1 = (1 - tb1[..., None]) * rawp[:, :-1] + tb1[..., None] * raw1
        c2 = (1 - tb2[..., None]) * raw1 + tb2[..., None] * rawp[:, 1:]
        csub = jnp.stack([c1, c2], axis=2).reshape(len(o), -1, 3)
        results["split"] = fb_composite(asub, jax.nn.sigmoid(csub), None)

        line = f"pose yaw={yaw:5.1f} pitch={pitch:5.1f} axis={axis} " \
               f"(oracle {t_oracle:.0f}s): "
        for k, v in results.items():
            line += f"{k} {psnr(np.asarray(v).reshape(oracle.shape), oracle):6.2f}  "
        print(line, flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 64)
