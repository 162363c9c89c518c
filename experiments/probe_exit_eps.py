"""Measure the cost of exit_eps=0 on the bricked path (VERDICT round-2 item 9).

The multi-chip bricked trainer shards the march across depth segments
(modules/bricked_trainer.py:312); segments cannot early-exit independently, so
that path runs the kernel with exit_eps=0. This probe quantifies what that
forfeits on a DENSE trained-like scene, single chip:

  - render: ms/pose with exit_eps=1e-4 (default) vs 0.0
  - train:  ms/step (32768-ray tile step, fwd + replay-VJP + Adam), same A/B

Run on the chip:  python experiments/probe_exit_eps.py [grid_size]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import numpy as np

GRID_SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 128
IMAGE_SIZE = 400
RAY_BATCH = 32768


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from make_synthetic_dataset import make_blob_scene
    from thr3ed_atom_tpu.modules.bricked_trainer import (
        bricked_train_step,
        make_bricked_train_statics,
    )
    from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
    from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose
    from thr3ed_atom_tpu.rendering.renderer import SHVoxGridRenderConfig
    from thr3ed_atom_tpu.utils.camera import (
        CameraBounds,
        CameraIntrinsics,
        pose_spherical,
    )

    scene = make_blob_scene(grid_size=GRID_SIZE, seed=3, converged=True)
    intrinsics = CameraIntrinsics(IMAGE_SIZE, IMAGE_SIZE, IMAGE_SIZE * 1.1)
    rng = np.random.default_rng(42)
    poses = [
        pose_spherical(rng.uniform(0, 360), rng.uniform(-90, 0), 4.0)
        for _ in range(24)
    ]

    # ---- render A/B ----
    for eps in (1e-4, 0.0):
        config = SHVoxGridRenderConfig(
            num_samples_per_ray=256,
            camera_bounds=CameraBounds(2.0, 6.0),
            perturb_sampled_points=False,
            white_bkgd=True,
            bricked_exit_eps=eps,
        )
        vm = VolumetricModel(
            scene, render_procedure="render_sh_voxel_grid_bricked",
            render_config=config,
        )
        for pose in poses[:12]:  # warm all variants
            out = vm.render(pose, intrinsics)
        float(jnp.sum(out.colour))
        best = np.inf
        for _ in range(5):
            t0 = time.perf_counter()
            for pose in poses:
                out = vm.render(pose, intrinsics)
            float(jnp.sum(out.colour))
            best = min(best, time.perf_counter() - t0)
        print(
            f"render exit_eps={eps:g}: {best / len(poses) * 1e3:7.2f} ms/pose",
            flush=True,
        )

    # ---- train A/B ----
    poses_np = np.stack(
        [np.hstack([p.rotation, p.translation]) for p in poses[:8]]
    ).astype(np.float32)
    poses_j = jnp.asarray(poses_np)
    images = jnp.asarray(
        rng.random((8, IMAGE_SIZE, IMAGE_SIZE, 3), dtype=np.float32)
    )
    tx = optax.adam(0.03)

    for eps in (1e-4, 0.0):
        state = {"grid": scene, "opt": tx.init(scene)}

        def statics_for(p):
            axis, flip = dominant_axis_for_pose(poses_np[p][:, :3])
            return make_bricked_train_statics(
                scene, axis, flip, image_height=IMAGE_SIZE,
                image_width=IMAGE_SIZE, focal=IMAGE_SIZE * 1.1,
                ray_batch_size=RAY_BATCH, white_bkgd=True, exit_eps=eps,
            )

        key = jax.random.PRNGKey(0)
        metrics = None
        for p in range(8):
            key, sub = jax.random.split(key)
            state["grid"], state["opt"], metrics = bricked_train_step(
                statics_for(p), tx, state["grid"], state["opt"], images,
                poses_j, jnp.int32(p), sub,
            )
        float(metrics["total_loss"])

        def one_pass(n=20):
            nonlocal key
            t0 = time.perf_counter()
            for _ in range(n):
                key, sub = jax.random.split(key)
                pp = int(rng.integers(8))
                state["grid"], state["opt"], m = bricked_train_step(
                    statics_for(pp), tx, state["grid"], state["opt"], images,
                    poses_j, jnp.int32(pp), sub,
                )
            float(m["total_loss"])
            return (time.perf_counter() - t0) / n

        best = min(one_pass() for _ in range(4))
        print(
            f"train  exit_eps={eps:g}: {best * 1e3:7.2f} ms/step "
            f"({RAY_BATCH / best / 1e6:.2f} M rays/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
