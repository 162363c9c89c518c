"""Measure gnomonic shear-warp render throughput on the real chip.

Same harness shapes as bench.py (128^3 converged blob scene, 400x400, orbit
poses): per-variant warmup until per-pass time stabilizes (the runtime serves
a deoptimized executable until the async AOT compile lands — see
DESIGN_NOTES.md), then best of 3 timed passes.

Run:  python experiments/perf_gnomonic.py [grid_size]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import numpy as np


def main():
    import jax.numpy as jnp

    from make_synthetic_dataset import make_blob_scene
    from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
    from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
    from thr3ed_atom_tpu.utils.camera import (
        CameraBounds,
        CameraIntrinsics,
        pose_spherical,
    )

    grid_size = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    image_size = 400
    num_poses = 50

    grid = make_blob_scene(grid_size=grid_size, seed=3, converged=True)
    intrinsics = CameraIntrinsics(image_size, image_size, image_size * 1.1)
    rng = np.random.default_rng(42)
    poses = [
        pose_spherical(rng.uniform(0, 360), rng.uniform(-90, 0), 4.0)
        for _ in range(num_poses)
    ]
    rays_per_pose = image_size * image_size

    def bench(procedure, cfg_kwargs, label):
        config = SHVoxGridRenderConfig(
            num_samples_per_ray=256,
            camera_bounds=CameraBounds(2.0, 6.0),
            perturb_sampled_points=False,
            white_bkgd=True,
            **cfg_kwargs,
        )
        vol_mod = VolumetricModel(grid, render_procedure=procedure, render_config=config)

        def sync(out):
            return float(jnp.sum(out.colour))

        best = np.inf
        stable = 0
        for it in range(14):
            t0 = time.perf_counter()
            for pose in poses[:12]:
                out = vol_mod.render(pose, intrinsics)
            sync(out)
            dt = time.perf_counter() - t0
            if dt > best * 0.98:
                stable += 1
                if stable >= 2 and it >= 3:
                    break
            else:
                stable = 0
            best = min(best, dt)

        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            for pose in poses:
                out = vol_mod.render(pose, intrinsics)
            sync(out)
            times.append(time.perf_counter() - t0)
        t_pass = min(times)
        rps = num_poses * rays_per_pose / t_pass
        print(
            f"{label:38s} {t_pass / num_poses * 1e3:8.2f} ms/pose  "
            f"{rps / 1e6:8.2f} M rays/s",
            flush=True,
        )
        return rps

    print(f"grid {grid_size}^3, image {image_size}^2, {num_poses} poses", flush=True)
    bench("render_sh_voxel_grid_gnomonic", {"gnomonic_pos_per_cell": 1}, "gnomonic P=1")
    bench("render_sh_voxel_grid_gnomonic", {"gnomonic_pos_per_cell": 2}, "gnomonic P=2")
    bench("render_sh_voxel_grid_gnomonic", {}, "gnomonic P=auto")
    bench("render_sh_voxel_grid_bricked", {}, "bricked K=auto (r2 default)")


if __name__ == "__main__":
    main()
