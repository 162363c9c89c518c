"""Evaluate a trained checkpoint with BOTH render procedures on the heldout set.

Separates train-side quality from eval-side quadrature: if the same grid scores
much lower under the bricked renderer than the fast one, the gap is in the
bricked EVAL (slab-crossing quadrature vs the uniform-sampling GT images), not
in the trained grid.

Usage: python experiments/parity/eval_cross.py /tmp/parity_ours_fast/saved_models/model_final.npz
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import numpy as np

from thr3ed_atom_tpu.data.dataset import PosedImagesDataset
from thr3ed_atom_tpu.modules.tester import test_sh_vox_grid_vol_mod_with_posed_images
import dataclasses

from thr3ed_atom_tpu.modules.volumetric_model import (
    VolumetricModel,
    create_volumetric_model_from_saved_model,
)

ckpt = Path(sys.argv[1])
import os
data = Path(os.environ.get("DS", "/tmp/parity_ds"))
test_dataset = PosedImagesDataset(
    images_dir=data / "test",
    camera_params_json=data / "test_camera_params.json",
    downsample_factor=1.0,
    rgba_white_bkgd=True,
)

for procedure in ("render_sh_voxel_grid_fast", "render_sh_voxel_grid",
                  "render_sh_voxel_grid_bricked"):
    base, _ = create_volumetric_model_from_saved_model(ckpt)
    vol_mod = VolumetricModel(
        base.thre3d_repr, render_procedure=procedure,
        render_config=base.render_config,
    )
    results = test_sh_vox_grid_vol_mod_with_posed_images(vol_mod, test_dataset)
    print(f"{procedure}: {results}")
