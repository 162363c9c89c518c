"""Replicate the canonical stage-4 OOM: train step (variant A) -> feedback
renders (specular + diffuse) -> train step (variant B), at 256^3/400px,
printing device memory stats between phases.

Usage: timeout 1800 python experiments/probe_256_oom.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
import optax

CKPT = "/tmp/canonical_256_full/saved_models/model_stage_4_iter_21001.npz"
START = time.time()


def t(msg):
    print(f"[{time.time() - START:7.1f}s] {msg}", flush=True)


def mem(tag):
    s = jax.local_devices()[0].memory_stats()
    if s:
        gib = 1024 ** 3
        t(f"  mem[{tag}]: in_use={s.get('bytes_in_use', 0)/gib:.2f} GiB "
          f"peak={s.get('peak_bytes_in_use', 0)/gib:.2f} GiB "
          f"limit={s.get('bytes_limit', 0)/gib:.2f} GiB")
    else:
        t(f"  mem[{tag}]: no stats available")


def main():
    from thr3ed_atom_tpu.data.dataset import PosedImagesDataset
    from thr3ed_atom_tpu.modules.volumetric_model import (
        create_volumetric_model_from_saved_model,
    )
    from thr3ed_atom_tpu.rendering.bricked import dominant_axis_for_pose
    from thr3ed_atom_tpu.rendering.gnomonic_train import (
        gnomonic_train_step,
        make_gnomonic_train_statics,
    )
    from thr3ed_atom_tpu.rendering.warp_matmul import warp_swap_for_pose

    t("loading 256^3 checkpoint")
    vol_mod, _ = create_volumetric_model_from_saved_model(CKPT)
    grid = vol_mod.thre3d_repr
    ds = PosedImagesDataset(
        "/tmp/canonical_ds400/train",
        "/tmp/canonical_ds400/train_camera_params.json",
    )
    intr = ds.camera_intrinsics
    H, W, focal = intr.height, intr.width, float(intr.focal)
    poses = [ds.extract_pose(p) for p in ds._camera_parameters.values()]
    variants = {}
    for p in poses:
        axis, flip = dominant_axis_for_pose(p.rotation)
        sw = warp_swap_for_pose(p.rotation, axis, flip, H, W, focal)
        variants.setdefault((axis, flip, sw), p)
    keys = list(variants)[:2]
    t(f"two variants: {keys}")
    mem("after load")

    tx = optax.adam(0.03)
    opt_state = tx.init(grid)
    mem("after adam init")
    img = jnp.zeros((H, W, 3), jnp.float32)

    def step(variant, g, os):
        axis, flip, sw = variant
        tstat = make_gnomonic_train_statics(
            g, axis, flip, image_height=H, image_width=W, white_bkgd=True,
            qb=128, warp_swap=sw,
        )
        p = variants[variant]
        return gnomonic_train_step(
            tstat, tx, g, os, img, jnp.asarray(p.rotation),
            jnp.asarray(p.translation), jnp.asarray(focal),
        )

    t("train step variant A (compile + run)")
    grid, opt_state, m = step(keys[0], grid, opt_state)
    jax.block_until_ready(grid.densities)
    t(f"  done loss={float(m['total_loss']):.4f}")
    mem("after step A")

    t("feedback render specular (1024 spp config)")
    vol_mod.thre3d_repr = grid
    out = vol_mod.render(poses[0], intr, num_samples_per_ray=1024)
    jax.block_until_ready(out.colour)
    mem("after specular render")
    t("feedback render diffuse")
    out = vol_mod.render(poses[0], intr, render_diffuse=True,
                         num_samples_per_ray=1024)
    jax.block_until_ready(out.colour)
    mem("after diffuse render")
    del out

    t("train step variant B (compile + run) — the OOM point")
    grid, opt_state, m = step(keys[1], grid, opt_state)
    jax.block_until_ready(grid.densities)
    t(f"  done loss={float(m['total_loss']):.4f}")
    mem("after step B")
    t("NO OOM — sequence survived")


if __name__ == "__main__":
    main()
