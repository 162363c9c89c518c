"""Alpha-compositing accumulator: density -> occupancy -> transmittance-weighted sums.

Parity: reference thre3d_atom/rendering/volumetric/accumulate.py:24-113. The transmittance
is an exclusive cumulative product along the sample axis — associative, so it can shard
across devices with lax.associative_scan if samples-per-ray ever needs to split; on one
chip XLA fuses the whole accumulation into the surrounding kernel.
"""
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from thr3ed_atom_tpu.rendering.interface import ProcessedPointsOnRays, Rays, RenderOut
from thr3ed_atom_tpu.utils.constants import (
    EXTRA_ACCUMULATED_WEIGHTS,
    EXTRA_DISPARITY,
    EXTRA_POINT_DENSITIES,
    EXTRA_POINT_DEPTHS,
    EXTRA_POINT_OCCUPANCIES,
    EXTRA_POINT_WEIGHTS,
    EXTRA_SAMPLE_INTERVALS,
    INFINITY,
    ZERO_PLUS,
)


def density2occupancy_pb(densities: jnp.ndarray, deltas: jnp.ndarray) -> jnp.ndarray:
    """Physically-based occupancy alpha = 1 - exp(-density * delta), from Lambert's law."""
    return 1.0 - jnp.exp(-(densities * deltas))


# registry so render configs can reference the transfer functions by name (no pickles)
DENSITY2OCCUPANCY: Dict[str, Callable] = {"pb": density2occupancy_pb}
TONE_MAPS: Dict[str, Callable] = {
    "sigmoid": jax.nn.sigmoid,
    "identity": lambda x: x,
}


def accumulate_radiance_density_on_rays(
    processed_points: ProcessedPointsOnRays,
    rays: Rays,
    key: Optional[jax.Array] = None,
    stochastic_density_noise_std: float = 0.0,
    density2occupancy: Callable = density2occupancy_pb,
    radiance_hdr_tone_map: Callable = jax.nn.sigmoid,
    white_bkgd: bool = True,
    extra_debug_info: bool = False,
) -> RenderOut:
    raw_radiance = processed_points.points[..., :-1]  # [N, S, C]
    raw_density = processed_points.points[..., -1]  # [N, S]
    depths = processed_points.depths  # [N, S]

    # sample intervals with an INFINITY tail, scaled to world units by ||ray dir||
    deltas = depths[..., 1:] - depths[..., :-1]
    inf_delta = jnp.full((*deltas.shape[:-1], 1), INFINITY, dtype=deltas.dtype)
    deltas = jnp.concatenate([deltas, inf_delta], axis=-1)
    deltas = deltas * jnp.linalg.norm(rays.directions, axis=-1, keepdims=True)

    if stochastic_density_noise_std > 0.0:
        assert key is not None, "stochastic density noise requires a PRNG key"
        noise = (
            jax.random.normal(key, raw_density.shape, dtype=raw_density.dtype)
            * stochastic_density_noise_std
        )
        raw_density = raw_density + noise

    alpha = density2occupancy(raw_density, deltas)  # [N, S]
    # clamp into the valid occupancy range: a no-op on the noise-free path, but keeps
    # negative noised densities from driving alpha to -inf through the INFINITY tail
    # delta (the reference NaNs in that configuration — accumulate.py:57-63)
    alpha = jnp.clip(alpha, 0.0, 1.0)

    # weights = alpha * exclusive-cumprod(1 - alpha)
    transmittance = jnp.cumprod(1.0 - alpha, axis=-1)
    exclusive_transmittance = jnp.concatenate(
        [jnp.ones_like(transmittance[..., :1]), transmittance[..., :-1]], axis=-1
    )
    weights = alpha * exclusive_transmittance

    colour = radiance_hdr_tone_map(raw_radiance)
    colour_render = jnp.sum(colour * weights[..., None], axis=-2)  # [N, C]
    acc_render = jnp.sum(weights, axis=-1, keepdims=True)  # [N, 1]

    if white_bkgd:
        colour_render = colour_render + (1.0 - acc_render)

    depth_render = jnp.sum(depths * weights, axis=-1, keepdims=True)
    # guard acc == 0 (fully empty rays): the reference propagates 0/0 = NaN here
    # (accumulate.py:85-88); we saturate to the maximum disparity instead
    disparity_render = 1.0 / jnp.maximum(
        ZERO_PLUS, depth_render / jnp.maximum(acc_render, ZERO_PLUS)
    )

    extra = {
        EXTRA_DISPARITY: disparity_render,
        EXTRA_ACCUMULATED_WEIGHTS: acc_render,
    }
    if extra_debug_info:
        extra.update(
            {
                EXTRA_POINT_DENSITIES: raw_density,
                EXTRA_POINT_OCCUPANCIES: alpha,
                EXTRA_POINT_WEIGHTS: weights,
                EXTRA_POINT_DEPTHS: depths,
                EXTRA_SAMPLE_INTERVALS: deltas,
            }
        )

    return RenderOut(colour=colour_render, depth=depth_render, extra=extra)
