"""On-chip quality-gate battery -> one checked-in JSON per round.

VERDICT round-4 item #8: the production quality gates
(tests/test_production_quality.py) are accelerator-only and skip on the CPU
suite, so "re-verified on chip" was only ever a commit-message claim. This
script runs the SAME measurements programmatically on the attached chip and
writes a JSON artifact (QUALITY_GATES_r{N}.json at the repo root) so each
round's gate battery is a recorded fact the README tables can cite.

Reference for what is being gated: the reference's render tests compare
procedures against a high-spp exact render
(/root/reference/thre3d_atom/thre3d_reprs/tests/test_voxels.py); the gates
here pin every accelerated path (bricked slab-march, fast top-K, gnomonic
shear-warp P=1/2/4, occupancy skipping) against exact@1024 on the canonical
128^3 / 400x400 shapes, on both the smooth blob scene and a sharp
(voxel-noise) variant, post the round-4 bf16-precision fix.

Usage (chip):  python tools/run_quality_gates.py -o QUALITY_GATES_r05.json
"""
import argparse
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))

GRID_SIZE = 128
IMAGE_SIZE = 400
POSE = (45.0, -40.0)


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return round(10.0 * np.log10(1.0 / max(mse, 1e-12)), 2)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("-o", "--output", default="QUALITY_GATES.json")
    args = ap.parse_args()

    import jax

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
    pose = pose_spherical(POSE[0], POSE[1], 4.0)

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
        out = np.asarray(vm.render(pose, intr).colour)
        print(f"# [{time.perf_counter() - t0:6.1f}s] {procedure} spp={spp} "
              f"{cfg}", flush=True)
        return out

    results = {
        "round_note": "post bf16-precision fix (round 4): the exact oracle "
        "itself is f32-exact; every dB here supersedes the round-2/3 tables "
        "measured against the quantized oracle",
        "backend": jax.default_backend(),
        "scene": f"blob scene {GRID_SIZE}^3 seed=3 converged, "
        f"{IMAGE_SIZE}x{IMAGE_SIZE}, pose {POSE}",
        "gates": {},
    }
    gates = results["gates"]

    def gate(name, value, threshold, note=""):
        gates[name] = {"dB": value, "gate": threshold,
                       "pass": bool(value > threshold)}
        if note:
            gates[name]["note"] = note
        print(f"# GATE {name}: {value} dB (gate >{threshold}) "
              f"{'PASS' if value > threshold else 'FAIL'}", flush=True)

    exact1024 = render(scene, "render_sh_voxel_grid", 1024,
                       parallel_rays_chunk_size=4096)

    # --- gnomonic shear-warp (the headline path), P quadrature ladder
    gn = {
        p: render(scene, "render_sh_voxel_grid_gnomonic", 1024,
                  gnomonic_pos_per_cell=p)
        for p in (1, 2, 4)
    }
    gate("gnomonic_P1_vs_exact1024", _psnr(gn[1], exact1024), 60.0)
    gate("gnomonic_P2_vs_exact1024", _psnr(gn[2], exact1024), 73.0,
         "the quality default carrying the headline bench; measured 74.78 "
         "with the production matmul CR warp (gather warp: 78.57 on the "
         "same render — the gap is warp reconstruction, a documented "
         "speed/quality trade)")
    gate("gnomonic_P4_vs_exact1024", _psnr(gn[4], exact1024), 75.0)
    gates["gnomonic_monotone_P"] = {
        "pass": bool(gates["gnomonic_P2_vs_exact1024"]["dB"]
                     > gates["gnomonic_P1_vs_exact1024"]["dB"]
                     < gates["gnomonic_P4_vs_exact1024"]["dB"])
    }

    # --- bricked slab-march quadrature ladder
    br = {
        k: render(scene, "render_sh_voxel_grid_bricked", 1024,
                  bricked_axis_supersample=k)
        for k in (1, 2, 4)
    }
    gate("bricked_K1_vs_exact1024", _psnr(br[1], exact1024), 60.0)
    gate("bricked_K2_vs_exact1024", _psnr(br[2], exact1024), 70.0)
    gate("bricked_K4_vs_exact1024", _psnr(br[4], exact1024), 75.0)

    # --- occupancy skip + early exit neutrality (exact-zero rule)
    br_off = render(scene, "render_sh_voxel_grid_bricked", 1024,
                    bricked_occupancy_alpha_thresh=0.0, bricked_exit_eps=0.0)
    gate("bricked_occupancy_neutrality", _psnr(br[2], br_off), 60.0,
         "on-vs-off, measured ~120 dB (lossless rule)")

    # --- fast top-K (soft-scene worst case)
    exact512 = render(scene, "render_sh_voxel_grid", 512,
                      parallel_rays_chunk_size=8192)
    f32_ = render(scene, "render_sh_voxel_grid_fast", 512, fast_topk=32)
    f64_ = render(scene, "render_sh_voxel_grid_fast", 512, fast_topk=64)
    gate("fast_top32_vs_exact512", _psnr(f32_, exact512), 25.0,
         "soft volumetric worst case; trained scenes are 1e-7-exact")
    gate("fast_top64_vs_exact512", _psnr(f64_, exact512), 31.0)

    # --- sharp-scene gnomonic (trained-field texture)
    rng = np.random.default_rng(11)
    import jax.numpy as jnp

    sharp = dataclasses.replace(
        scene,
        densities=scene.densities
        + jnp.asarray(rng.normal(0, 1.2, scene.densities.shape), jnp.float32),
        features=scene.features
        + jnp.asarray(rng.normal(0, 0.3, scene.features.shape), jnp.float32),
    )
    sharp_exact = render(sharp, "render_sh_voxel_grid", 1024,
                         parallel_rays_chunk_size=4096)
    sharp_gn = render(sharp, "render_sh_voxel_grid_gnomonic", 1024,
                      gnomonic_pos_per_cell=2)
    gate("gnomonic_P2_sharp_scene", _psnr(sharp_gn, sharp_exact), 30.0,
         "voxel-scale WHITE-NOISE worst case, measured 34.63 dB and "
         "warp-invariant (matmul 34.63 / gather-CR 34.76 / gather-bilinear "
         "34.72) -> march tent reconstruction, not warp; trained-field "
         "texture agrees at 52.3 dB cross-eval (PARITY_RUN.md)")

    results["wall_s"] = round(time.perf_counter() - t0, 1)
    results["all_pass"] = all(g.get("pass", True) for g in gates.values())
    Path(args.output).write_text(json.dumps(results, indent=1) + "\n")
    print(json.dumps({"all_pass": results["all_pass"],
                      "wall_s": results["wall_s"],
                      "output": args.output}))


if __name__ == "__main__":
    main()
