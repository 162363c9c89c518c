"""Quality metrics (parity: reference thre3d_atom/utils/metric_utils.py:10-21)."""
from typing import Union

import jax.numpy as jnp
import numpy as np

from thr3ed_atom_tpu.utils.constants import INFINITY


def mse2psnr(mse: Union[float, jnp.ndarray]) -> Union[float, jnp.ndarray]:
    """PSNR from a mean-squared error (pixels in [0, 1]); mse == 0 maps to INFINITY."""
    if isinstance(mse, (jnp.ndarray, np.ndarray)):
        return jnp.where(
            mse == 0.0, jnp.full_like(mse, INFINITY), -10.0 * jnp.log10(mse)
        )
    return -10.0 * float(np.log10(mse)) if mse != 0 else INFINITY
