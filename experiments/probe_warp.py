"""Quantify what limits gnomonic end-to-end quality: warp interpolation
(supersample x warp_order) vs along-ray quadrature (P), on CPU interpret mode
at a moderate scale. PSNR is vs the per-texel-ray trapezoid oracle evaluated
directly at the camera pixels (so the march itself cancels; only warp +
quadrature differences remain in each sweep)."""
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import dataclasses

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from tests.test_gnomonic import _make_grid, _oracle_at_rays  # noqa: E402
from thr3ed_atom_tpu.rendering import gnomonic as gn  # noqa: E402
from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose  # noqa: E402
from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig  # noqa: E402
from thr3ed_atom_tpu.utils.camera import (  # noqa: E402
    CameraBounds,
    CameraIntrinsics,
    pose_spherical,
)

key = jax.random.PRNGKey(2)
grid = _make_grid(key, size=32, post="relu")
kern = jnp.ones((3, 3, 3)) / 27.0


def blur(a):
    ap = jnp.pad(a, [(1, 1)] * 3 + [(0, 0)], mode="edge")
    out = jnp.zeros_like(a)
    for dx in range(3):
        for dy in range(3):
            for dz in range(3):
                out = out + kern[dx, dy, dz] * ap[
                    dx:dx + a.shape[0], dy:dy + a.shape[1], dz:dz + a.shape[2]]
    return out


grid = dataclasses.replace(grid, densities=blur(grid.densities),
                           features=blur(grid.features))
pose = pose_spherical(200.0, -30.0, 3.5)
H = W = 96
focal = 105.0
intr = CameraIntrinsics(H, W, focal)
rotation = np.asarray(pose.rotation).reshape(3, 3)
origin = np.asarray(pose.translation).reshape(3)
axis, flip = dominant_axis_for_pose(rotation)

px = np.arange(W) + 0.5
py = np.arange(H) + 0.5
gx, gy = np.meshgrid(px, py, indexing="xy")
dcam = np.stack([(gx - W / 2) / focal, -(gy - H / 2) / focal,
                 -np.ones_like(gx)], -1)
dirs = (dcam @ rotation.T).reshape(-1, 3).astype(np.float32)

for P_ref in (4,):
    oc, _, _, _ = _oracle_at_rays(grid, origin, jnp.asarray(dirs), P_ref,
                                  axis, flip, True)
    oc = np.asarray(oc)
    for P in (1, 2, 4):
        for ss in (1.25, 1.5, 2.0):
            for order in (1, 3, 5):
                cfg = SHVoxGridRenderConfig(
                    num_samples_per_ray=32,
                    camera_bounds=CameraBounds(1.0, 6.0),
                    white_bkgd=False,
                    gnomonic_pos_per_cell=P,
                    gnomonic_supersample=ss,
                    gnomonic_warp_order=order,
                )
                out = gn.render_image_gnomonic(grid, pose, intr, cfg,
                                               interpret=True)
                got = np.asarray(out.colour).reshape(-1, 3)
                mse = float(np.mean((got - oc) ** 2))
                psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
                print(f"P={P} ss={ss:4} order={order}: {psnr:6.2f} dB "
                      f"(ref P={P_ref})", flush=True)
