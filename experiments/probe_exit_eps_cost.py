"""What does exit_eps=0 (sample-parallel training) cost? (VERDICT r2 weak #6)

Depth-segment sharding forfeits early exit — a segment cannot know the
transmittance accumulated by the segments in front of it, so the mesh trainer
hard-codes exit_eps=0.0 (modules/bricked_trainer.py:313). This probe measures
the single-chip bricked TRAIN step at exit_eps=1e-4 (the single-device
default) vs exit_eps=0.0 on two scenes:

  - the converged blob scene (the bench scene: ~5% occupancy, opaque blobs —
    realistic mid-training geometry), and
  - a SOLID scene (densities >= 8 everywhere: transmittance saturates within
    a few cells — the best case for early exit, worst case for forfeiting it)

The delta bounds the per-device efficiency loss of the depth-segment layout;
if it is small even on the solid scene, segment-local early exit is not worth
implementing. Run on the chip: python experiments/probe_exit_eps_cost.py
"""
import dataclasses
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

GRID = 128
H = W = 400
STEPS = 30


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from make_synthetic_dataset import make_blob_scene
    from thr3ed_atom_tpu.modules.bricked_trainer import (
        bricked_train_step,
        make_bricked_train_statics,
    )
    from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose
    from thr3ed_atom_tpu.utils.camera import pose_spherical

    blob = make_blob_scene(grid_size=GRID, seed=3, converged=True)
    solid = dataclasses.replace(
        blob, densities=jnp.full_like(blob.densities, 8.0)
    )
    pose = pose_spherical(45.0, -40.0, 4.0)
    rot = np.asarray(pose.rotation).reshape(3, 3)
    axis, flip = dominant_axis_for_pose(rot)
    poses = jnp.asarray(
        np.concatenate([rot, np.asarray(pose.translation).reshape(3, 1)], 1)
    )[None].astype(jnp.float32)
    images = jnp.zeros((1, H, W, 3), jnp.float32)
    tx = optax.adam(3e-2)

    results = {}
    for scene_name, grid0 in (("blob", blob), ("solid", solid)):
        for eps in (1e-4, 0.0):
            statics = make_bricked_train_statics(
                grid0, axis, flip, image_height=H, image_width=W,
                focal=W * 1.1, ray_batch_size=32768, white_bkgd=True,
                exit_eps=eps,
            )
            # the step DONATES grid/opt buffers — each config must start from
            # a fresh copy or the next config would pass deleted arrays
            grid = jax.tree_util.tree_map(jnp.copy, grid0)
            opt_state = tx.init(grid)
            key = jax.random.PRNGKey(0)
            # donation: step returns fresh buffers; warm twice (compile+AOT)
            for i in range(3):
                key, k = jax.random.split(key)
                grid, opt_state, metrics = bricked_train_step(
                    statics, tx, grid, opt_state, images, poses,
                    jnp.int32(0), k)
            jax.block_until_ready(metrics["total_loss"])
            t0 = time.perf_counter()
            for i in range(STEPS):
                key, k = jax.random.split(key)
                grid, opt_state, metrics = bricked_train_step(
                    statics, tx, grid, opt_state, images, poses,
                    jnp.int32(0), k)
            jax.block_until_ready(metrics["total_loss"])
            ms = (time.perf_counter() - t0) / STEPS * 1e3
            results[f"{scene_name}_eps{eps:g}"] = round(ms, 3)
            print(f"# {scene_name} exit_eps={eps:g}: {ms:.3f} ms/step",
                  flush=True)

    for s in ("blob", "solid"):
        on, off = results[f"{s}_eps0.0001"], results[f"{s}_eps0"]
        results[f"{s}_cost_pct"] = round((off / on - 1.0) * 100.0, 1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
