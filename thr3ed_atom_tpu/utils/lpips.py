"""LPIPS (Learned Perceptual Image Patch Similarity) in pure JAX.

Counterpart of the reference's ``lpips.LPIPS(net="vgg")`` tester metric
(reference thre3d_atom/modules/testers.py:40-49). Architecture follows Zhang et
al. 2018: VGG16 conv features at relu{1_2, 2_2, 3_3, 4_3, 5_3}, per-channel unit
normalization, learned non-negative 1x1 linear heads, spatial + layer averaging.

Weights resolution order:
  1. An npz produced by ``tools/convert_lpips_weights.py`` (run OFFLINE on a
     machine with torchvision + the lpips package; this deployment has no network
     egress so the official VGG/LPIPS tensors cannot be downloaded here). Point
     ``THR3ED_LPIPS_WEIGHTS`` at the file or pass ``weights_path``.
  2. Otherwise: deterministic seeded He-initialized VGG weights with uniform
     linear heads. Zhang et al. (CVPR 2018, Sec. 5) show random-network features
     already track human perceptual judgments far better than pixel metrics, so
     this fallback is a well-defined, reproducible perceptual metric — reported
     as ``lpips_rand_vgg`` so it is never mistaken for calibrated LPIPS scores.
"""
from __future__ import annotations

import os
from functools import partial
from pathlib import Path
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature config: channels per conv layer, 'M' = 2x2 max pool
_VGG_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512)
# indices (into the conv sequence) AFTER which LPIPS taps features
_TAP_AFTER_CONV = (1, 3, 6, 9, 12)  # relu1_2, relu2_2, relu3_3, relu4_3, relu5_3

# input normalization constants from the official LPIPS implementation
# (applied to images scaled to [-1, 1])
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_ENV_WEIGHTS = "THR3ED_LPIPS_WEIGHTS"
_FALLBACK_SEED = 1889


def random_lpips_weights(seed: int = _FALLBACK_SEED) -> Dict[str, np.ndarray]:
    """Deterministic He-initialized VGG + uniform linear heads (the calibration-free
    fallback; see module docstring)."""
    rng = np.random.default_rng(seed)
    weights: Dict[str, np.ndarray] = {}
    in_ch = 3
    conv_i = 0
    for item in _VGG_CFG:
        if item == "M":
            continue
        fan_in = in_ch * 9
        weights[f"conv{conv_i}_w"] = (
            rng.standard_normal((3, 3, in_ch, item)) * np.sqrt(2.0 / fan_in)
        ).astype(np.float32)
        weights[f"conv{conv_i}_b"] = np.zeros((item,), np.float32)
        in_ch = item
        conv_i += 1
    for tap_i, conv_idx in enumerate(_TAP_AFTER_CONV):
        ch = [c for c in _VGG_CFG if c != "M"][conv_idx]
        weights[f"lin{tap_i}_w"] = np.full((ch,), 1.0 / ch, np.float32)
    weights["calibrated"] = np.zeros((), np.float32)  # marker: 0 = random fallback
    return weights


def load_lpips_weights(
    weights_path: Optional[os.PathLike] = None,
) -> Tuple[Dict[str, jnp.ndarray], bool]:
    """(weights pytree, calibrated?) — official npz if available, else the seeded
    random fallback."""
    path = weights_path or os.environ.get(_ENV_WEIGHTS)
    if path and Path(path).exists():
        arrays = dict(np.load(str(path)))
        arrays.setdefault("calibrated", np.ones((), np.float32))
        return (
            {k: jnp.asarray(v) for k, v in arrays.items()},
            bool(arrays["calibrated"]),
        )
    arrays = random_lpips_weights()
    return {k: jnp.asarray(v) for k, v in arrays.items()}, False


def _vgg_taps(weights, x):
    """x [N, H, W, 3] in [-1, 1] -> list of tapped feature maps (post-relu)."""
    x = (x - _SHIFT) / _SCALE
    taps = []
    conv_i = 0
    for item in _VGG_CFG:
        if item == "M":
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            continue
        # Precision.HIGHEST: TPU's default single-pass matmul/conv mode
        # quantizes f32 operands to bf16; this is a METRIC (scores must match
        # the official f32 lpips package when calibrated weights are loaded),
        # so the multi-pass f32 algorithm is required on accelerators.
        x = jax.lax.conv_general_dilated(
            x,
            weights[f"conv{conv_i}_w"],
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST,
        ) + weights[f"conv{conv_i}_b"]
        x = jax.nn.relu(x)
        if conv_i in _TAP_AFTER_CONV:
            taps.append(x)
        conv_i += 1
    return taps


@partial(jax.jit, static_argnums=())
def lpips(
    weights: Dict[str, jnp.ndarray], img_a: jnp.ndarray, img_b: jnp.ndarray
) -> jnp.ndarray:
    """Perceptual distance between [N, H, W, 3] images in [0, 1] -> [N]."""
    a = img_a * 2.0 - 1.0
    b = img_b * 2.0 - 1.0
    taps_a = _vgg_taps(weights, a)
    taps_b = _vgg_taps(weights, b)
    total = 0.0
    for i, (fa, fb) in enumerate(zip(taps_a, taps_b)):
        na = fa / jnp.sqrt(jnp.sum(fa**2, axis=-1, keepdims=True) + 1e-10)
        nb = fb / jnp.sqrt(jnp.sum(fb**2, axis=-1, keepdims=True) + 1e-10)
        diff = (na - nb) ** 2
        lin = weights[f"lin{i}_w"]
        total = total + jnp.mean(jnp.sum(diff * lin, axis=-1), axis=(1, 2))
    return total


class LPIPSMetric:
    """Stateful convenience wrapper mirroring the reference tester's usage."""

    def __init__(self, weights_path: Optional[os.PathLike] = None) -> None:
        self.weights, self.calibrated = load_lpips_weights(weights_path)

    @property
    def name(self) -> str:
        return "lpips_vgg" if self.calibrated else "lpips_rand_vgg"

    def __call__(self, img_a: jnp.ndarray, img_b: jnp.ndarray) -> float:
        if img_a.ndim == 3:
            img_a, img_b = img_a[None], img_b[None]
        return float(jnp.mean(lpips(self.weights, img_a, img_b)))
