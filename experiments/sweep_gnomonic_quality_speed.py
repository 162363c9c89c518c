"""Joint quality x speed sweep for the gnomonic shear-warp renderer.

Round-3 target (VERDICT.md item 1): the QUALITY-DEFAULT configuration must
clear >= 80 dB vs the exact uniform renderer at 1024 spp on the canonical
shapes (128^3 trained-like scene, 400x400) while staying >= 15M rays/s.
This sweep measures both sides for each (pos_per_cell, supersample,
warp_order) candidate so the default can be chosen from data rather than
extrapolated from the CPU warp probes (experiments/probe_warp.py).

Run on the chip:  python experiments/sweep_gnomonic_quality_speed.py [grid]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import numpy as np


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


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

    quality_angles = [(45.0, -40.0), (120.0, -5.0), (275.0, -60.0)]
    quality_poses = [pose_spherical(a, e, 4.0) for a, e in quality_angles]
    rng = np.random.default_rng(42)
    perf_poses = [
        pose_spherical(rng.uniform(0, 360), rng.uniform(-90, 0), 4.0)
        for _ in range(num_poses)
    ]
    rays_per_pose = image_size * image_size

    def render_all(procedure, poses, spp, **cfg_kwargs):
        config = SHVoxGridRenderConfig(
            num_samples_per_ray=spp,
            camera_bounds=CameraBounds(2.0, 6.0),
            perturb_sampled_points=False,
            white_bkgd=True,
            **cfg_kwargs,
        )
        vm = VolumetricModel(grid, render_procedure=procedure, render_config=config)
        return vm, [np.asarray(vm.render(p, intrinsics).colour) for p in poses]

    print("rendering exact@1024 oracle (3 poses)...", flush=True)
    _, exact = render_all(
        "render_sh_voxel_grid", quality_poses, 1024, parallel_rays_chunk_size=4096
    )

    def timed_pass(vm):
        def sync(out):
            return float(jnp.sum(out.colour))

        best = np.inf
        stable = 0
        for it in range(14):
            t0 = time.perf_counter()
            for pose in perf_poses[:12]:
                out = vm.render(pose, intrinsics)
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
            for pose in perf_poses:
                out = vm.render(pose, intrinsics)
            sync(out)
            times.append(time.perf_counter() - t0)
        return min(times)

    print(f"grid {grid_size}^3, image {image_size}^2", flush=True)
    print(f"{'config':42s} {'minPSNR':>8s} {'ms/pose':>8s} {'Mrays/s':>8s}", flush=True)
    candidates = []
    # quality x quadrature at the default frame; qb A/B (0 = whole-Qn
    # stripes, 128/256 = q-split composite with finer occupancy/early-exit)
    for pos_per_cell in (1, 2, 4):
        for qb in (0, 128, 256):
            candidates.append(dict(gnomonic_pos_per_cell=pos_per_cell,
                                   gnomonic_supersample=1.25,
                                   gnomonic_warp_order=3, gnomonic_qb=qb))
    # the supersample lever (warp-quality ceiling) at the quality quadrature
    for warp_order in (1, 3):
        candidates.append(dict(gnomonic_pos_per_cell=2,
                               gnomonic_supersample=1.5,
                               gnomonic_warp_order=warp_order,
                               gnomonic_qb=128))
    # prefiltered B-spline warp (+0.2-0.5 dB over CR at equal taps on CPU)
    candidates.append(dict(gnomonic_pos_per_cell=2, gnomonic_supersample=1.25,
                           gnomonic_warp_order=5, gnomonic_qb=128))
    for cfg in candidates:
        label = (f"P={cfg['gnomonic_pos_per_cell']} "
                 f"ss={cfg['gnomonic_supersample']} "
                 f"warp={cfg['gnomonic_warp_order']} "
                 f"qb={cfg['gnomonic_qb']}")
        try:
            vm, imgs = render_all(
                "render_sh_voxel_grid_gnomonic", quality_poses, 1024, **cfg
            )
            q = min(_psnr(x, e) for x, e in zip(imgs, exact))
            t_pass = timed_pass(vm)
        except Exception as exc:  # one bad config must not kill the battery
            print(f"{label:42s} FAILED: {type(exc).__name__}: {exc}",
                  flush=True)
            continue
        ms = t_pass / num_poses * 1e3
        rps = num_poses * rays_per_pose / t_pass / 1e6
        print(f"{label:42s} {q:8.2f} {ms:8.2f} {rps:8.2f}", flush=True)


if __name__ == "__main__":
    main()
