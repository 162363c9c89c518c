"""Training-throughput benchmark: rays/sec through ONE fused optimization step
at the canonical 128^3 / 400x400 shapes.

Production (round-3) path: the gnomonic whole-pose train step — repack ->
u-resample -> fused composite kernel forward -> replay-VJP backward -> warp
adjoint -> Adam (rendering/gnomonic_train.py); one step trains every pixel of
one training view (160K rays). Pass --bricked to measure the round-2 tile
trainer (32768-ray steps through the slab-march kernel) instead.

Counterpart of bench.py for the train side of BASELINE.md's "rays/sec/chip
(train + render)" target; the reference's training logs its wall-clock via
"TIME CHECK" (thre3d_atom/modules/trainers.py:222,402-404) without a checked-in
harness, so this defines one. History on this repo: round 1 ~21K rays/s
(scatter-bound XLA backward), round 2 925K (bricked tile trainer).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "rays/sec", "vs_baseline": N}
vs_baseline is value / 50e6 (same driver target as bench.py).
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent / "tools"))

GRID_SIZE = 128
IMAGE_SIZE = 400
RAY_BATCH = 32768  # bricked mode only; gnomonic steps are whole-pose (H*W rays)
TARGET_RAYS_PER_SEC = 50e6


def _poses_images(rng):
    import jax.numpy as jnp

    from thr3ed_atom_tpu.utils.camera import pose_spherical

    poses_np = np.stack(
        [
            np.hstack([p.rotation, p.translation])
            for p in (
                pose_spherical(rng.uniform(0, 360), rng.uniform(-90, 0), 4.0)
                for _ in range(8)
            )
        ]
    ).astype(np.float32)
    images = jnp.asarray(
        rng.random((8, IMAGE_SIZE, IMAGE_SIZE, 3), dtype=np.float32)
    )
    return poses_np, jnp.asarray(poses_np), images


def _measure(step_fn, warm_poses, rng, rays_per_step, label):
    """Warm every march-axis variant, then repeat timed passes until the best
    pass stops improving (the runtime serves a deoptimized executable until the
    per-variant async AOT compile lands)."""
    import jax

    key = jax.random.PRNGKey(0)
    metrics = None
    for p in warm_poses:
        key, sub = jax.random.split(key)
        metrics = step_fn(p, sub)
    float(metrics["total_loss"])

    def one_pass(n=10):
        nonlocal key
        t0 = time.perf_counter()
        for _ in range(n):
            key, sub = jax.random.split(key)
            m = step_fn(int(rng.integers(8)), sub)
        float(m["total_loss"])  # pipelined: one sync at the end
        return (time.perf_counter() - t0) / n

    best = one_pass()
    miss = 0
    for _ in range(12):
        t = one_pass()
        if t < 0.95 * best:
            best, miss = t, 0
        else:
            best, miss = min(best, t), miss + 1
            if miss >= 2:
                break

    dt = min(one_pass(30) for _ in range(3))
    rays_per_sec = rays_per_step / dt
    print(
        json.dumps(
            {
                "metric": f"train rays/sec/chip ({GRID_SIZE}^3 grid, {label})",
                "value": round(rays_per_sec, 1),
                "unit": "rays/sec",
                "vs_baseline": round(rays_per_sec / TARGET_RAYS_PER_SEC, 4),
            }
        )
    )


def main() -> None:
    import jax.numpy as jnp
    import optax

    from make_synthetic_dataset import make_blob_scene
    from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose

    scene = make_blob_scene(grid_size=GRID_SIZE, seed=3, converged=True)
    rng = np.random.default_rng(0)
    poses_np, poses, images = _poses_images(rng)
    tx = optax.adam(0.03)

    if "--bricked" in sys.argv:
        from thr3ed_atom_tpu.modules.bricked_trainer import (
            bricked_train_step,
            make_bricked_train_statics,
        )

        state = {"grid": scene, "opt": tx.init(scene)}

        def statics_for(p):
            axis, flip = dominant_axis_for_pose(poses_np[p][:, :3])
            return make_bricked_train_statics(
                scene, axis, flip, image_height=IMAGE_SIZE,
                image_width=IMAGE_SIZE, focal=IMAGE_SIZE * 1.1,
                ray_batch_size=RAY_BATCH, white_bkgd=True,
            )

        def step(p, k):
            state["grid"], state["opt"], metrics = bricked_train_step(
                statics_for(p), tx, state["grid"], state["opt"], images, poses,
                jnp.int32(p), k,
            )
            return metrics

        _measure(
            step, range(8), rng, RAY_BATCH,
            f"{RAY_BATCH} rays/step, fused slab-march fwd+bwd + Adam",
        )
        return

    from thr3ed_atom_tpu.rendering.gnomonic_train import (
        gnomonic_train_step,
        make_gnomonic_train_statics,
    )

    state = {"grid": scene, "opt": tx.init(scene)}
    tstats = {}

    # q-split default follows the production render config (qb=128, the chip
    # A/B winner: 4.456M vs 4.395M rays/s train, +12% render); --qb0 reverts
    # to full-height stripes for the A/B.
    qb = 0 if "--qb0" in sys.argv else 128
    if "--qb" in sys.argv:  # legacy A/B spelling
        qb = 128

    def tstat_for(p):
        v = dominant_axis_for_pose(poses_np[p][:, :3])
        if v not in tstats:
            tstats[v] = make_gnomonic_train_statics(
                scene, v[0], v[1], image_height=IMAGE_SIZE,
                image_width=IMAGE_SIZE, white_bkgd=True, qb=qb,
            )
        return tstats[v]

    if "--single" in sys.argv:
        # secondary metric: one pose per optimization step (repack + Adam
        # amortize over nothing) — the historical bench config
        def step(p, k):
            del k  # the gnomonic pipeline is deterministic
            state["grid"], state["opt"], metrics = gnomonic_train_step(
                tstat_for(p), tx, state["grid"], state["opt"], images[p],
                poses[p, :, :3], poses[p, :, 3], jnp.float32(IMAGE_SIZE * 1.1),
            )
            return metrics

        _measure(
            step, range(8), rng, IMAGE_SIZE * IMAGE_SIZE,
            f"whole-pose {IMAGE_SIZE}x{IMAGE_SIZE} steps, gnomonic fwd + "
            "replay-VJP bwd + Adam",
        )
        return

    # PRODUCTION configuration (default since round 5): the trainer's 4-view
    # accumulation step (modules/trainer.py floors gn_poses_per_step at 4 —
    # the round-4 view-diversity requirement), which also amortizes the
    # repack and the Adam update over k poses. gnomonic_train_step_multi
    # requires the k poses to share one march variant, exactly like the
    # trainer's variant-bucketed pose sampling.
    from thr3ed_atom_tpu.rendering.gnomonic_train import (
        gnomonic_train_step_multi,
    )

    K_POSES = 4
    variants = {}
    for p in range(8):
        variants.setdefault(dominant_axis_for_pose(poses_np[p][:, :3]),
                            []).append(p)
    buckets = [idx for idx in variants.values() if len(idx) >= K_POSES]
    if not buckets:
        # synthesize a bucket by reusing poses of the largest variant
        idx = max(variants.values(), key=len)
        buckets = [(idx * K_POSES)[:K_POSES]]

    def multi_step(b, k):
        del k
        idx = buckets[b % len(buckets)][:K_POSES]
        sel = jnp.asarray(idx)
        state["grid"], state["opt"], metrics = gnomonic_train_step_multi(
            tstat_for(idx[0]), tx, state["grid"], state["opt"],
            images[sel], poses[sel][:, :, :3], poses[sel][:, :, 3],
            jnp.float32(IMAGE_SIZE * 1.1),
        )
        return metrics

    _measure(
        multi_step, range(len(buckets)), rng,
        K_POSES * IMAGE_SIZE * IMAGE_SIZE,
        f"{K_POSES}-view accumulation steps (production trainer config), "
        f"whole-pose {IMAGE_SIZE}x{IMAGE_SIZE}, gnomonic fwd + replay-VJP "
        "bwd + Adam",
    )


if __name__ == "__main__":
    main()
