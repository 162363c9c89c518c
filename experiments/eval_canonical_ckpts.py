"""Evaluate canonical-run stage checkpoints on the heldout views with BOTH the
gnomonic (production) and the fast (reference-quadrature) renderers.

Separates 'training degraded the grid' from 'the gnomonic eval misrepresents
the grid' for the stage-3 heldout drop (44.9 dB at 64^3 -> 31.1 dB at 128^3).

Usage: timeout 1800 python experiments/eval_canonical_ckpts.py [ckpt ...]
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_CKPTS = [
    "/tmp/canonical_256_full/saved_models/model_stage_2_iter_14000.npz",
    "/tmp/canonical_256_full/saved_models/model_stage_3_iter_21000.npz",
]
START = time.time()


def t(msg):
    print(f"[{time.time() - START:7.1f}s] {msg}", flush=True)


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


def main():
    from thr3ed_atom_tpu.data.dataset import PosedImagesDataset
    from thr3ed_atom_tpu.modules.volumetric_model import (
        create_volumetric_model_from_saved_model,
    )

    ckpts = sys.argv[1:] or DEFAULT_CKPTS
    ds = PosedImagesDataset(
        "/tmp/canonical_ds400/test",
        "/tmp/canonical_ds400/test_camera_params.json",
    )
    intr = ds.camera_intrinsics
    poses = [ds.extract_pose(p) for p in ds._camera_parameters.values()]
    gts = [np.asarray(ds[i][0]) for i in range(len(ds))]

    for ckpt in ckpts:
        if not Path(ckpt).exists():
            t(f"SKIP missing {ckpt}")
            continue
        vol_mod, _ = create_volumetric_model_from_saved_model(ckpt)
        dims = vol_mod.thre3d_repr.grid_dims
        for proc in ("render_sh_voxel_grid_gnomonic", "render_sh_voxel_grid_fast"):
            vol_mod._render_procedure_name = proc
            vals = []
            for p, gt in zip(poses, gts):
                # the fast path at 1024 spp needs small chunks to fit HBM
                out = vol_mod.render(
                    p, intr, num_samples_per_ray=1024,
                    parallel_rays_chunk_size=8192,
                )
                vals.append(psnr(out.colour, gt))
            t(f"{Path(ckpt).name} dims={dims} {proc.split('_')[-1]:>8}: "
              f"mean {np.mean(vals):6.2f} dB  per-view "
              + " ".join(f"{v:.2f}" for v in vals))


if __name__ == "__main__":
    main()
