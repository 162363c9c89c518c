"""Heldout evaluation: full-image renders + PSNR + LPIPS.

Parity: reference thre3d_atom/modules/testers.py:17-71. The reference computes LPIPS
with the ``lpips`` pip package (VGG variant); here LPIPS is a pure-JAX
implementation (utils/lpips.py) so TEST_SET_LPIPS is ALWAYS computed: with official
converted weights when THR3ED_LPIPS_WEIGHTS points at an npz from
tools/convert_lpips_weights.py, otherwise with the documented seeded
random-feature fallback (reported as ``lpips_rand_vgg`` in the logs so the two are
never conflated).
"""
from typing import Optional

import numpy as np

from thr3ed_atom_tpu.data.dataset import PosedImagesDataset
from thr3ed_atom_tpu.modules.volumetric_model import VolumetricModel
from thr3ed_atom_tpu.utils.camera import CameraPose
from thr3ed_atom_tpu.utils.logging import log
from thr3ed_atom_tpu.utils.lpips import LPIPSMetric
from thr3ed_atom_tpu.utils.metrics import mse2psnr

TEST_SET_PSNR = "TEST_SET_PSNR"
TEST_SET_LPIPS = "TEST_SET_LPIPS"
# the seeded random-feature fallback is NOT comparable with calibrated LPIPS, so
# it reports under its own results/TensorBoard key — dashboards and gates can
# never silently compare the two
TEST_SET_LPIPS_RAND = "TEST_SET_LPIPS_RAND"

_lpips_metric: Optional[LPIPSMetric] = None


def _get_lpips() -> LPIPSMetric:
    global _lpips_metric
    if _lpips_metric is None:
        _lpips_metric = LPIPSMetric()
        log.info(f"LPIPS metric initialized: {_lpips_metric.name}")
    return _lpips_metric


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
    lpips_metric = _get_lpips()

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
        lpips_scores.append(lpips_metric(colour, np.asarray(image, np.float32)))
        log.info(
            f"test image {index}: psnr {psnrs[-1]:.3f} "
            f"{lpips_metric.name} {lpips_scores[-1]:.4f}"
        )

    mean_psnr = float(np.mean(psnrs))
    lpips_key = TEST_SET_LPIPS if lpips_metric.calibrated else TEST_SET_LPIPS_RAND
    results = {
        TEST_SET_PSNR: mean_psnr,
        lpips_key: float(np.mean(lpips_scores)),
    }
    log.info(
        f"heldout PSNR: {mean_psnr:.3f}  "
        f"heldout LPIPS ({lpips_metric.name}): {results[lpips_key]:.4f}"
    )

    if tensorboard_writer is not None:
        for name, value in results.items():
            tensorboard_writer.add_scalar(name, value, global_step=global_step)
    return results
