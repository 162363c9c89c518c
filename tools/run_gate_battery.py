"""On-chip quality-gate battery with a checked-in JSON artifact.

Runs the production-scale quality gates (the same measurements as
tests/test_production_quality.py, which are skipped on the CPU backend) on
the real accelerator and writes GATES_r{N}.json at the repo root so
"re-verified on chip" is a recorded artifact, not a commit-message claim
(round-4 verdict housekeeping item). The exact renderer at 1024 spp is the
oracle everywhere; it runs all geometry dots at Precision.HIGHEST (post
round-4 bf16 fix), so these numbers supersede any dB measured before that
fix.

Run: python tools/run_gate_battery.py [--round N] [--out FILE]
Prints one JSON line per gate plus a summary; exit code 1 if any gate fails.
"""
import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GRID_SIZE = 128
IMAGE_SIZE = 400
POSE_ANGLES = ((45.0, -40.0), (160.0, -20.0))


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", type=int, default=5)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    import jax

    if jax.default_backend() == "cpu":
        print("refusing to run the gate battery on CPU: interpret-mode "
              "kernels take hours and bf16-class bugs are invisible there",
              file=sys.stderr)
        return 2

    from make_synthetic_dataset import make_blob_scene
    from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
    from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
    from thr3ed_atom_tpu.utils.camera import (
        CameraBounds,
        CameraIntrinsics,
        pose_spherical,
    )

    t0 = time.perf_counter()
    scene = make_blob_scene(grid_size=GRID_SIZE, seed=3, converged=True)
    intr = CameraIntrinsics(IMAGE_SIZE, IMAGE_SIZE, IMAGE_SIZE * 1.1)

    def render(grid, procedure, spp, **cfg):
        config = SHVoxGridRenderConfig(
            num_samples_per_ray=spp,
            camera_bounds=CameraBounds(2.0, 6.0),
            perturb_sampled_points=False,
            white_bkgd=True,
            **cfg,
        )
        vm = VolumetricModel(grid, render_procedure=procedure,
                             render_config=config)
        return [
            np.asarray(vm.render(pose_spherical(a, e, 4.0), intr).colour)
            for a, e in POSE_ANGLES
        ]

    gates = {}

    def gate(name, value, threshold, detail=""):
        ok = bool(value > threshold)
        gates[name] = {"db": round(value, 2), "threshold": threshold,
                       "ok": ok, "detail": detail}
        print(f"[{time.perf_counter() - t0:6.0f}s] {name}: {value:.2f} dB "
              f"(gate > {threshold}) {'OK' if ok else 'FAIL'} {detail}",
              flush=True)

    print("rendering exact@1024 oracle...", flush=True)
    exact = render(scene, "render_sh_voxel_grid", 1024,
                   parallel_rays_chunk_size=4096)

    # --- gnomonic quadrature ladder (headline procedure, production default
    # P=2 / matmul CR warp / qb=128)
    pv = {}
    for p in (1, 2, 4):
        g = render(scene, "render_sh_voxel_grid_gnomonic", 1024,
                   gnomonic_pos_per_cell=p, gnomonic_qb=128)
        pv[p] = min(_psnr(x, e) for x, e in zip(g, exact))
    gate("gnomonic_P1_vs_exact1024", pv[1], 60.0)
    gate("gnomonic_P2_vs_exact1024", pv[2], 75.0,
         "the headline bench config")
    gate("gnomonic_P4_vs_exact1024", pv[4], pv[2],
         "quadrature monotonicity")

    # --- sharp scene (voxel-scale noise: the texture a trained relu field
    # actually has)
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
    exact_sharp = render(sharp, "render_sh_voxel_grid", 1024,
                         parallel_rays_chunk_size=4096)
    g = render(sharp, "render_sh_voxel_grid_gnomonic", 1024,
               gnomonic_pos_per_cell=2, gnomonic_qb=128)
    gate("gnomonic_P2_sharp_scene", min(
        _psnr(x, e) for x, e in zip(g, exact_sharp)), 45.0)

    # --- bricked ladder + occupancy-skip losslessness
    for k in (1, 2, 4):
        b = render(scene, "render_sh_voxel_grid_bricked", 1024,
                   bricked_axis_supersample=k)
        pv[f"b{k}"] = min(_psnr(x, e) for x, e in zip(b, exact))
    gate("bricked_K1_vs_exact1024", pv["b1"], 60.0)
    gate("bricked_K2_monotone", pv["b2"], pv["b1"])
    gate("bricked_K4_monotone", pv["b4"], pv["b2"])
    on = render(scene, "render_sh_voxel_grid_bricked", 1024)
    off = render(scene, "render_sh_voxel_grid_bricked", 1024,
                 bricked_occupancy_alpha_thresh=0.0, bricked_exit_eps=0.0)
    gate("bricked_occupancy_skip_neutral",
         min(_psnr(a, b) for a, b in zip(on, off)), 60.0)

    # --- fast top-K (soft-scene worst case)
    exact512 = render(scene, "render_sh_voxel_grid", 512,
                      parallel_rays_chunk_size=8192)
    f32v = min(_psnr(f, e) for f, e in zip(
        render(scene, "render_sh_voxel_grid_fast", 512, fast_topk=32),
        exact512))
    f64v = min(_psnr(f, e) for f, e in zip(
        render(scene, "render_sh_voxel_grid_fast", 512, fast_topk=64),
        exact512))
    gate("fast_top32_vs_exact512", f32v, 25.0, "soft-scene worst case")
    gate("fast_top64_vs_exact512", f64v, max(31.0, f32v))

    out = {
        "round": args.round,
        "grid": GRID_SIZE,
        "image": IMAGE_SIZE,
        "poses": list(POSE_ANGLES),
        "all_ok": all(g["ok"] for g in gates.values()),
        "wall_s": round(time.perf_counter() - t0, 1),
        "gates": gates,
    }
    path = args.out or str(
        Path(__file__).resolve().parent.parent / f"GATES_r{args.round:02d}.json"
    )
    Path(path).write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps({"all_ok": out["all_ok"], "wall_s": out["wall_s"],
                      "artifact": path}))
    return 0 if out["all_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
