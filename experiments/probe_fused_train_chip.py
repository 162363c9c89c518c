"""On-chip A/B: fused (v3) vs v2 gnomonic train step at production shapes
(128^3 grid, 400x400 whole-pose steps, qb=128).

The fused path deletes the t1 forward tensor, the dt1 cotangent tensor and
the Ru/RvT geometry tensors from HBM (rendering/gnomonic_train.py
_make_backward_kernel_fused). Prints steady-state ms/step + rays/s for both
pipelines and cross-checks first-step metrics.

Run: python experiments/probe_fused_train_chip.py [grid_size] [image_size]
"""
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

GRID_SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 128
IMAGE_SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 400


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from make_synthetic_dataset import make_blob_scene
    from thr3ed_atom_tpu.rendering import gnomonic_train as gt
    from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose
    from thr3ed_atom_tpu.utils.camera import pose_spherical

    scene = make_blob_scene(grid_size=GRID_SIZE, seed=3, converged=True)
    rng = np.random.default_rng(0)
    pose = pose_spherical(45.0, -40.0, 4.0)
    rotation = jnp.asarray(np.asarray(pose.rotation).reshape(3, 3), jnp.float32)
    origin = jnp.asarray(np.asarray(pose.translation).reshape(3), jnp.float32)
    axis, flip = dominant_axis_for_pose(np.asarray(pose.rotation).reshape(3, 3))
    image = jnp.asarray(
        rng.random((IMAGE_SIZE, IMAGE_SIZE, 3), dtype=np.float32)
    )
    focal = jnp.float32(IMAGE_SIZE * 1.1)
    tx = optax.adam(0.03)

    results = {}
    for fused in (True, False):
        t0 = time.time()
        tstat = gt.make_gnomonic_train_statics(
            scene, axis, flip, image_height=IMAGE_SIZE, image_width=IMAGE_SIZE,
            white_bkgd=True, qb=128, fused=fused,
        )
        print(f"fused={fused}: frame={tstat.frame} (statics {time.time()-t0:.1f}s)",
              flush=True)
        grid = jax.tree_util.tree_map(jnp.copy, scene)
        opt_state = tx.init(grid)
        grid, opt_state, metrics = gt.gnomonic_train_step(
            tstat, tx, grid, opt_state, image, rotation, origin, focal
        )
        m0 = {k: float(v) for k, v in metrics.items()}
        print(f"fused={fused}: first step done in {time.time()-t0:.1f}s "
              f"metrics={m0}", flush=True)
        results[fused] = m0

        def one_pass(n=20):
            nonlocal grid, opt_state
            t0 = time.perf_counter()
            for _ in range(n):
                grid, opt_state, metrics = gt.gnomonic_train_step(
                    tstat, tx, grid, opt_state, image, rotation, origin, focal
                )
            float(metrics["total_loss"])
            return (time.perf_counter() - t0) / n

        best = min(one_pass() for _ in range(4))
        rays = IMAGE_SIZE * IMAGE_SIZE / best
        print(f"fused={fused}: {best*1e3:.2f} ms/step = {rays/1e6:.2f}M rays/s",
              flush=True)

    a, b = results[True], results[False]
    for k in a:
        rel = abs(a[k] - b[k]) / max(abs(b[k]), 1e-9)
        print(f"metric {k}: fused {a[k]:.6f} v2 {b[k]:.6f} rel {rel:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
