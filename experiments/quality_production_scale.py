"""Production-scale quality: fast/bricked/occupancy vs the exact renderer.

Measures at the canonical shapes (128^3 trained-like scene, 400x400 image):
  1. fast top-K (K=32/64, f32/bf16 tables) vs exact, 512 spp   -> PSNR
  2. bricked slab-march vs exact @ 1024 spp                     -> PSNR
  3. bricked occupancy-skip on vs off                           -> PSNR

The thresholds asserted in tests/test_production_quality.py come from these
measurements.
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from make_synthetic_dataset import make_blob_scene
from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
from thr3ed_atom_tpu.utils.camera import CameraBounds, CameraIntrinsics, pose_spherical

GRID_SIZE = 128
IMAGE_SIZE = 400


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def main():
    grid = make_blob_scene(grid_size=GRID_SIZE, seed=3, converged=True)
    intr = CameraIntrinsics(IMAGE_SIZE, IMAGE_SIZE, IMAGE_SIZE * 1.1)
    poses = [pose_spherical(a, e, 4.0) for a, e in ((45.0, -40.0), (200.0, -15.0))]

    def render(procedure, spp, **cfg):
        config = SHVoxGridRenderConfig(
            num_samples_per_ray=spp,
            camera_bounds=CameraBounds(2.0, 6.0),
            perturb_sampled_points=False,
            white_bkgd=True,
            **cfg,
        )
        vm = VolumetricModel(grid, render_procedure=procedure, render_config=config)
        return [np.asarray(vm.render(p, intr).colour) for p in poses]

    t0 = time.time()
    # small chunks: 32768 rays x 1024 samples x 28ch of f32 temps would exceed HBM
    exact_512 = render("render_sh_voxel_grid", 512, parallel_rays_chunk_size=8192)
    exact_1024 = render("render_sh_voxel_grid", 1024, parallel_rays_chunk_size=4096)
    print(f"exact renders done in {time.time()-t0:.0f}s")

    for k in (32, 64):
        for bf16 in (False, True):
            fast = render("render_sh_voxel_grid_fast", 512, fast_topk=k,
                          fast_bf16_features=bf16)
            ps = min(psnr(f, e) for f, e in zip(fast, exact_512))
            print(f"fast K={k} bf16={bf16}: min PSNR vs exact@512 = {ps:.1f} dB")

    bricked = render("render_sh_voxel_grid_bricked", 1024)
    ps = min(psnr(b, e) for b, e in zip(bricked, exact_1024))
    print(f"bricked vs exact@1024: min PSNR = {ps:.1f} dB")

    bricked_noskip = render("render_sh_voxel_grid_bricked", 1024,
                            bricked_occupancy_alpha_thresh=0.0)
    ps = min(psnr(b, n) for b, n in zip(bricked, bricked_noskip))
    print(f"bricked occupancy on vs off: min PSNR = {ps:.1f} dB")


if __name__ == "__main__":
    main()
