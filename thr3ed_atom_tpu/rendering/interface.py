"""Functional render interface: typed pytrees + the 3-stage render composition.

Parity: reference thre3d_atom/rendering/volumetric/render_interface.py:13-134. The torch
dataclasses become registered JAX pytrees so they flow through jit/vmap/shard_map; the
3-stage ``render()`` composition (sampler -> point processor -> accumulator) is kept as
the architectural seam where alternative samplers/representations plug in. Randomness is
threaded explicitly via jax.random keys instead of global torch RNG state.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Dict, NamedTuple, Union

import jax
import jax.numpy as jnp

from thr3ed_atom_tpu.utils.camera import CameraBounds
from thr3ed_atom_tpu.utils.constants import NUM_COORD_DIMENSIONS


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Rays:
    """Bundle of rays as a struct-of-arrays pytree: origins [N, 3], directions [N, 3]."""

    origins: jnp.ndarray
    directions: jnp.ndarray

    def __post_init__(self):
        # shapes may be traced; only validate trailing static dim
        assert self.origins.shape[-1] == NUM_COORD_DIMENSIONS
        assert self.directions.shape[-1] == NUM_COORD_DIMENSIONS

    def __len__(self) -> int:
        return self.origins.shape[0]

    def __getitem__(self, item) -> "Rays":
        return Rays(origins=self.origins[item], directions=self.directions[item])


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class RenderOut:
    """Per-ray render output: colour [N, 3], depth [N, 1], plus named extras."""

    colour: jnp.ndarray
    depth: jnp.ndarray
    extra: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)


class SampledPointsOnRays(NamedTuple):
    points: jnp.ndarray  # [N, S, 3]
    depths: jnp.ndarray  # [N, S]


class ProcessedPointsOnRays(NamedTuple):
    points: jnp.ndarray  # [N, S, C + 1] (radiance ++ density)
    depths: jnp.ndarray  # [N, S]


# stage function types (parity: render_interface.py:96-101)
RaySamplerFunction = Callable[..., SampledPointsOnRays]
PointProcessorFunction = Callable[..., ProcessedPointsOnRays]
AccumulatorFunction = Callable[..., RenderOut]


def render(
    rays: Rays,
    camera_bounds: Union[CameraBounds, jnp.ndarray],
    num_samples: int,
    sampler_fn: RaySamplerFunction,
    point_processor_fn: PointProcessorFunction,
    accumulator_fn: AccumulatorFunction,
) -> RenderOut:
    """Compose the three stages over flat [N, 3] rays (render_interface.py:103-134)."""
    assert rays.origins.ndim == 2, "render() requires flat [N, 3] rays"
    sampled_points = sampler_fn(rays, camera_bounds, num_samples)
    processed_points = point_processor_fn(sampled_points, rays)
    return accumulator_fn(processed_points, rays)
