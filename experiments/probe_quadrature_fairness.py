"""Quadrature fairness: how accurate is the REFERENCE harness's own 256-spp
midpoint quadrature, vs the gnomonic analytic trapezoid at P=1 / P=2?

The bench harness mirrors the reference render-speed test (256 uniform
samples/ray). "Quality default" for the gnomonic headline has been P=2
(~255 positions, matching the reference's SAMPLE COUNT). But sample count is
not fidelity: the reference's 256-spp midpoint rule has its own quadrature
error vs the continuum, while the gnomonic march integrates the piecewise-
linear density analytically between trilinear-exact plane crossings. If
exact@256's agreement with exact@1024 is BELOW gnomonic-P=1's agreement with
exact@1024, then P=1 is already higher-fidelity than the harness being
mirrored, and is the fair throughput configuration.

Measures on the bench scene (128^3 converged blobs, 400x400, 3 poses):
  exact@256  vs exact@1024   (the reference harness's own quadrature error)
  exact@512  vs exact@1024
  gnomonic P=1 (CR matmul warp, qb=128) vs exact@1024
  gnomonic P=2 (same) vs exact@1024

Run: python experiments/probe_quadrature_fairness.py [grid_size] [image_size]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from make_synthetic_dataset import make_blob_scene
from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
from thr3ed_atom_tpu.utils.camera import CameraBounds, CameraIntrinsics, pose_spherical

GRID_SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 128
IMAGE_SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 400


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def main():
    grid = make_blob_scene(grid_size=GRID_SIZE, seed=3, converged=True)
    intr = CameraIntrinsics(IMAGE_SIZE, IMAGE_SIZE, IMAGE_SIZE * 1.1)
    poses = [
        pose_spherical(a, e, 4.0)
        for a, e in ((45.0, -40.0), (200.0, -15.0), (310.0, -70.0))
    ]

    def render(procedure, spp, chunk=8192, **cfg):
        config = SHVoxGridRenderConfig(
            num_samples_per_ray=spp,
            camera_bounds=CameraBounds(2.0, 6.0),
            perturb_sampled_points=False,
            white_bkgd=True,
            parallel_rays_chunk_size=chunk,
            **cfg,
        )
        vm = VolumetricModel(grid, render_procedure=procedure, render_config=config)
        return [np.asarray(vm.render(p, intr).colour) for p in poses]

    t0 = time.time()
    exact_1024 = render("render_sh_voxel_grid", 1024, chunk=4096)
    print(f"exact@1024 done in {time.time()-t0:.0f}s", flush=True)

    def report(label, frames):
        vals = [psnr(a, b) for a, b in zip(frames, exact_1024)]
        print(f"{label:42s} {np.mean(vals):6.2f} dB  (per-pose: "
              + ", ".join(f"{v:.2f}" for v in vals) + ")", flush=True)

    report("exact@256 vs exact@1024", render("render_sh_voxel_grid", 256))
    report("exact@512 vs exact@1024", render("render_sh_voxel_grid", 512))
    for P in (1, 2):
        for impl in ("matmul", "gather"):
            for order in (1, 3, 5):
                frames = render(
                    "render_sh_voxel_grid_gnomonic", 256,
                    gnomonic_pos_per_cell=P, gnomonic_qb=128,
                    gnomonic_warp_impl=impl, gnomonic_warp_order=order,
                )
                report(
                    f"gnomonic P={P} warp={impl} order={order} vs exact@1024",
                    frames,
                )
    for ss in (1.5, 2.0):
        frames = render(
            "render_sh_voxel_grid_gnomonic", 256,
            gnomonic_pos_per_cell=1, gnomonic_qb=128,
            gnomonic_supersample=ss,
        )
        report(f"gnomonic P=1 matmul CR ss={ss} vs exact@1024", frames)


if __name__ == "__main__":
    main()
