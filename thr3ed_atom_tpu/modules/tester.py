"""Heldout evaluation: full-image renders + PSNR (+ LPIPS when available).

Parity: reference thre3d_atom/modules/testers.py:17-71. The reference computes LPIPS with
the ``lpips`` pip package (VGG variant); that package and its pretrained weights are not
available in every deployment (and this environment has no network egress), so LPIPS is
computed when importable and skipped with a log line otherwise.
"""
from typing import Optional

import numpy as np

from thr3ed_atom_tpu.data.dataset import PosedImagesDataset
from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
from thr3ed_atom_tpu.utils.camera import CameraPose
from thr3ed_atom_tpu.utils.logging import log
from thr3ed_atom_tpu.utils.metrics import mse2psnr

TEST_SET_PSNR = "TEST_SET_PSNR"
TEST_SET_LPIPS = "TEST_SET_LPIPS"


def _try_lpips():
    try:
        import lpips  # noqa: F401
        import torch

        return lpips.LPIPS(net="vgg"), torch
    except Exception:
        return None, None


def test_sh_vox_grid_vol_mod_with_posed_images(
    vol_mod: VolumetricModel,
    test_dataset: PosedImagesDataset,
    tensorboard_writer=None,
    global_step: Optional[int] = None,
) -> dict:
    """Render every test view at render_num_samples_per_ray (non-optimized sampling,
    reference testers.py:30-37) and average PSNR / LPIPS."""
    log.info("Running heldout-set evaluation...")
    intrinsics = test_dataset.camera_intrinsics
    lpips_computer, torch = _try_lpips()

    psnrs, lpips_scores = [], []
    for index in range(len(test_dataset)):
        image, pose_arr = test_dataset[index]
        pose = CameraPose(rotation=pose_arr[:, :3], translation=pose_arr[:, 3:])
        rendered = vol_mod.render(
            pose,
            intrinsics,
            optimized_sampling=False,
            num_samples_per_ray=vol_mod.render_config.render_num_samples_per_ray,
        )
        colour = np.asarray(rendered.colour)
        mse = float(np.mean((colour - image) ** 2))
        psnrs.append(mse2psnr(mse))

        if lpips_computer is not None:
            with torch.no_grad():
                pred = torch.from_numpy(colour[None]).permute(0, 3, 1, 2) * 2 - 1
                target = torch.from_numpy(image[None]).permute(0, 3, 1, 2) * 2 - 1
                lpips_scores.append(float(lpips_computer(pred, target)))
        log.info(f"test image {index}: psnr {psnrs[-1]:.3f}")

    mean_psnr = float(np.mean(psnrs))
    results = {TEST_SET_PSNR: mean_psnr}
    log.info(f"heldout PSNR: {mean_psnr:.3f}")
    if lpips_scores:
        results[TEST_SET_LPIPS] = float(np.mean(lpips_scores))
        log.info(f"heldout LPIPS: {results[TEST_SET_LPIPS]:.4f}")
    else:
        log.info("LPIPS unavailable (lpips package/weights not present); skipping")

    if tensorboard_writer is not None:
        for name, value in results.items():
            tensorboard_writer.add_scalar(name, value, global_step=global_step)
    return results
