"""Production-scale quality gates for the accelerated render paths.

These run the CANONICAL shapes (128^3 trained-like scene, 400x400 image) and so
need a real accelerator - they are skipped on the CPU test backend where the
interpret-mode kernel would take hours. Thresholds come from measured values
(see DESIGN_NOTES.md round-2 results):

  - bricked vs exact@1024: K=1 76.1 dB, K=2 82.6 dB, K=4 88.4 dB
  - occupancy skipping + early exit: 120 dB (the exact-zero rule is lossless)
  - fast top-K vs exact@512 on this SOFT scene: K=32 28.2 dB, K=64 35.7 dB
    (soft volumetric worst case - on TRAINED scenes fast == exact to 1e-7,
    pinned by the parity runs)
"""
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="production-scale shapes need a real accelerator",
)

GRID_SIZE = 128
IMAGE_SIZE = 400


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


@pytest.fixture(scope="module")
def scene():
    from make_synthetic_dataset import make_blob_scene

    return make_blob_scene(grid_size=GRID_SIZE, seed=3, converged=True)


def _render(grid, procedure, spp, pose_angles=((45.0, -40.0),), **cfg):
    from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
    from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
    from thr3ed_atom_tpu.utils.camera import (
        CameraBounds,
        CameraIntrinsics,
        pose_spherical,
    )

    config = SHVoxGridRenderConfig(
        num_samples_per_ray=spp,
        camera_bounds=CameraBounds(2.0, 6.0),
        perturb_sampled_points=False,
        white_bkgd=True,
        **cfg,
    )
    vm = VolumetricModel(grid, render_procedure=procedure, render_config=config)
    intr = CameraIntrinsics(IMAGE_SIZE, IMAGE_SIZE, IMAGE_SIZE * 1.1)
    return [
        np.asarray(vm.render(pose_spherical(a, e, 4.0), intr).colour)
        for a, e in pose_angles
    ]


def test_bricked_quadrature_vs_exact_at_production_scale(scene):
    exact = _render(scene, "render_sh_voxel_grid", 1024,
                    parallel_rays_chunk_size=4096)
    psnrs = {}
    for k in (1, 2, 4):
        b = _render(scene, "render_sh_voxel_grid_bricked", 1024,
                    bricked_axis_supersample=k)
        psnrs[k] = min(_psnr(x, e) for x, e in zip(b, exact))
    # measured 76.1 / 82.6 / 88.4 dB; gate with margin + monotonicity
    assert psnrs[1] > 60.0, psnrs
    assert psnrs[2] > psnrs[1], psnrs
    assert psnrs[4] > psnrs[2], psnrs


def test_occupancy_skip_neutral_at_production_scale(scene):
    on = _render(scene, "render_sh_voxel_grid_bricked", 1024)
    off = _render(scene, "render_sh_voxel_grid_bricked", 1024,
                  bricked_occupancy_alpha_thresh=0.0, bricked_exit_eps=0.0)
    p = min(_psnr(a, b) for a, b in zip(on, off))
    assert p > 60.0, p  # measured 120 dB


def test_fast_topk_monotone_at_production_scale(scene):
    exact = _render(scene, "render_sh_voxel_grid", 512,
                    parallel_rays_chunk_size=8192)
    p32 = min(_psnr(f, e) for f, e in zip(
        _render(scene, "render_sh_voxel_grid_fast", 512, fast_topk=32), exact))
    p64 = min(_psnr(f, e) for f, e in zip(
        _render(scene, "render_sh_voxel_grid_fast", 512, fast_topk=64), exact))
    # soft-scene worst case: measured 28.2 / 35.7 dB; trained scenes are 1e-7-exact
    assert p32 > 25.0 and p64 > 31.0, (p32, p64)
    assert p64 > p32, (p32, p64)


def test_gnomonic_quality_at_production_scale(scene):
    """The gnomonic shear-warp path (the headline bench procedure) vs the exact
    uniform renderer at 1024 spp, canonical shapes. Quality must rise with P
    (quadrature) and the auto default (P=2 at 128^3) must clear the production
    gate. Measured round-3 (bilinear warp): P=1 71.1 / P=2 77.1 / P=4 78.7 dB;
    the hull-clamped Catmull-Rom warp (now default) raises the warp-limited
    ceiling (experiments/probe_warp.py)."""
    exact = _render(scene, "render_sh_voxel_grid", 1024,
                    parallel_rays_chunk_size=4096)
    psnrs = {}
    for p in (1, 2, 4):
        g = _render(scene, "render_sh_voxel_grid_gnomonic", 1024,
                    gnomonic_pos_per_cell=p)
        psnrs[p] = min(_psnr(x, e) for x, e in zip(g, exact))
    assert psnrs[1] > 60.0, psnrs
    assert psnrs[2] > psnrs[1], psnrs
    assert psnrs[4] > psnrs[2], psnrs
    # the quality default (auto = P=2 at 128^3) carries the headline bench.
    # Chip-measured vs the post-bf16-fix f32-exact oracle (round 5,
    # QUALITY_GATES_r05.json): 74.78 dB with the production matmul CR warp
    # (the gather warp reads 78.57 on the same render — the gap is the
    # two-pass warp's sheared-basis reconstruction, a documented speed/
    # quality trade measured warp-side, not march-side); gate with margin
    assert psnrs[2] > 73.0, psnrs


def test_gnomonic_quality_on_sharp_scene(scene):
    """Renderer agreement is scene-sharpness-dependent (PARITY_RUN.md
    cross-eval: a trained 64^3 grid agreed at only ~44 dB before the
    texel-density floor, vs 77+ dB on the smooth blob). Gate the production
    shapes on a SHARP variant: the blob scene with voxel-scale density and
    feature noise, the texture a trained relu field actually has."""
    import dataclasses

    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    sharp = dataclasses.replace(
        scene,
        densities=scene.densities
        + jnp.asarray(rng.normal(0, 1.2, scene.densities.shape), jnp.float32),
        features=scene.features
        + jnp.asarray(rng.normal(0, 0.3, scene.features.shape), jnp.float32),
    )
    exact = _render(sharp, "render_sh_voxel_grid", 1024,
                    parallel_rays_chunk_size=4096)
    g = _render(sharp, "render_sh_voxel_grid_gnomonic", 1024,
                gnomonic_pos_per_cell=2)
    p = min(_psnr(x, e) for x, e in zip(g, exact))
    # Chip-measured (round 5, QUALITY_GATES_r05.json): 34.63 dB — and
    # WARP-INVARIANT (matmul 34.63 / gather-CR 34.76 / gather-bilinear
    # 34.72 on the same render), so the disagreement is the march's tent
    # reconstruction of VOXEL-SCALE WHITE NOISE, the adversarial worst
    # case. Trained-field texture (the realistic sharp case) agrees far
    # better: 52.3 dB cross-eval at matched texel density, and the
    # end-to-end parity runs show gnomonic-trained grids scoring best
    # under every eval (PARITY_RUN.md). Gate the white-noise worst case
    # with margin against regressions.
    assert p > 30.0, p
