"""Localize the matmul-warp's systematic error (probe_quadrature_fairness:
matmul CR stuck at 54.7 dB vs exact, independent of P and supersample, while
gather CR reaches 79 dB — an ss-independent error means a bug, not an
interpolation limit).

Renders one pose through the real pipeline up to the composited state, warps
it with both implementations, and maps the disagreement spatially + vs pose
steepness. CPU (interpret mode), small shapes.
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from make_synthetic_dataset import make_blob_scene
from thr3ed_atom_tpu.rendering import gnomonic as gn
from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose
from thr3ed_atom_tpu.rendering.warp_matmul import warp_swap_for_pose
from thr3ed_atom_tpu.utils.camera import pose_spherical

GRID = 32
IMG = 96


def main():
    grid = make_blob_scene(grid_size=GRID, seed=3, converged=True)
    focal = IMG * 1.1
    for yaw, pitch in ((45.0, -40.0), (310.0, -70.0)):
        pose = pose_spherical(yaw, pitch, 4.0)
        rot = np.asarray(pose.rotation).reshape(3, 3)
        axis, flip = dominant_axis_for_pose(rot)
        statics = gn.statics_for_grid(grid, axis, flip, pos_per_cell=1,
                                      interpret=True, qb=0)
        ss = gn.effective_supersample(1.25, statics, IMG, IMG)
        slices = gn._repack_jit(grid, statics)
        rot_j = jnp.asarray(rot, jnp.float32)
        org = jnp.asarray(np.asarray(pose.translation), jnp.float32).reshape(3)
        state, xr, yr = gn._march_gnomonic(
            slices, rot_j, org, statics, IMG, IMG, focal, ss
        )
        swap = warp_swap_for_pose(rot, axis, flip, IMG, IMG, focal)
        out_mm = gn._warp_to_camera(
            state, xr, yr, rot_j, statics, IMG, IMG, focal, ss, True,
            warp_order=3, warp_impl="matmul", warp_swap=swap,
        )
        out_ga = gn._warp_to_camera(
            state, xr, yr, rot_j, statics, IMG, IMG, focal, ss, True,
            warp_order=3, warp_impl="gather",
        )
        d = np.abs(np.asarray(out_mm.colour) - np.asarray(out_ga.colour))
        mse = float(np.mean(d ** 2))
        print(f"pose ({yaw},{pitch}) axis={axis} flip={flip} swap={swap} "
              f"ss={ss:.2f}")
        print(f"  colour disagreement: max {d.max():.5f} mean {d.mean():.6f} "
              f"psnr {10*np.log10(1.0/max(mse,1e-12)):.2f} dB")
        # where: top/bottom/left/right margins vs interior
        h, w = d.shape[:2]
        q = d.max(axis=-1)
        print(f"  row-max profile (8 bands): "
              + " ".join(f"{q[i*h//8:(i+1)*h//8].max():.4f}" for i in range(8)))
        print(f"  col-max profile (8 bands): "
              + " ".join(f"{q[:, i*w//8:(i+1)*w//8].max():.4f}" for i in range(8)))
        # also compare depth + acc channels
        da = np.abs(np.asarray(out_mm.extra["accumulated_weight"])
                    - np.asarray(out_ga.extra["accumulated_weight"]))
        print(f"  acc disagreement: max {da.max():.5f}")


if __name__ == "__main__":
    main()
