"""Ray samplers: uniform depth sampling (with stratified jitter / disparity spacing) and
the AABB-clipped variant.

Parity: reference thre3d_atom/rendering/volumetric/sample.py. The slab-test AABB
intersection (sample.py:71-184) is re-derived in fully vectorized form: the reference's
sequential per-axis merge with early disjointness flags is algebraically equivalent to the
global max-of-entries / min-of-exits test with non-strict overlap, which is what we
compute — no per-axis where-chains needed on TPU.
"""
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from thr3ed_atom_tpu.models.voxels import AxisAlignedBoundingBox
from thr3ed_atom_tpu.rendering.interface import Rays, SampledPointsOnRays
from thr3ed_atom_tpu.utils.camera import CameraBounds
from thr3ed_atom_tpu.utils.constants import ZERO_PLUS


def _broadcast_bounds(
    bounds: Union[CameraBounds, jnp.ndarray], num_rays: int, dtype
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """CameraBounds (scalars) or per-ray [N, 2] tensor -> (near [N, 1], far [N, 1])."""
    if isinstance(bounds, CameraBounds):
        near = jnp.full((num_rays, 1), bounds.near, dtype=dtype)
        far = jnp.full((num_rays, 1), bounds.far, dtype=dtype)
    else:
        near, far = bounds[:, :1], bounds[:, 1:]
    return near, far


def sample_uniform_points_on_rays(
    rays: Rays,
    bounds: Union[CameraBounds, jnp.ndarray],
    num_samples: int,
    key: Optional[jax.Array] = None,
    perturb: bool = True,
    linear_disparity_sampling: bool = False,
) -> SampledPointsOnRays:
    """z = lerp(near, far, linspace(0, 1, S)), optional inverse-depth spacing, optional
    stratified jitter within midpoint intervals (sample.py:46-67)."""
    rays_o = rays.origins.reshape(-1, rays.origins.shape[-1])
    rays_d = rays.directions.reshape(-1, rays.directions.shape[-1])
    num_rays = rays_o.shape[0]
    dtype = rays_o.dtype

    near, far = _broadcast_bounds(bounds, num_rays, dtype)

    t_vals = jnp.linspace(0.0, 1.0, num_samples, dtype=dtype)[None, :]
    if linear_disparity_sampling:
        z_vals = 1.0 / (1.0 / (near + ZERO_PLUS) * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        z_vals = near * (1.0 - t_vals) + far * t_vals

    if perturb:
        assert key is not None, "perturbed sampling requires a PRNG key"
        mid_points = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper_points = jnp.concatenate([mid_points, z_vals[..., -1:]], axis=-1)
        lower_points = jnp.concatenate([z_vals[..., :1], mid_points], axis=-1)
        t_rand = jax.random.uniform(key, (num_rays, num_samples), dtype=dtype)
        z_vals = lower_points + (upper_points - lower_points) * t_rand
    else:
        z_vals = jnp.broadcast_to(z_vals, (num_rays, num_samples))

    sampled_points = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[:, :, None]
    return SampledPointsOnRays(sampled_points, z_vals)


def ray_aabb_intersection(
    rays: Rays, bounds: CameraBounds, aabb: AxisAlignedBoundingBox
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray [N, 2] (near, far) from the slab test; rays that miss the box fall back to
    the scene bounds; negative entries clipped at 0 (sample.py:71-184)."""
    origins, directions = rays.origins, rays.directions
    dtype = origins.dtype
    num_rays = origins.shape[0]

    box_lo = jnp.array(
        [aabb.x_range[0], aabb.y_range[0], aabb.z_range[0]], dtype=dtype
    )
    box_hi = jnp.array(
        [aabb.x_range[1], aabb.y_range[1], aabb.z_range[1]], dtype=dtype
    )

    # the reference guards division with an additive epsilon rather than a signed one
    inv_d = 1.0 / (directions + ZERO_PLUS)
    t_a = (box_lo[None, :] - origins) * inv_d  # [N, 3]
    t_b = (box_hi[None, :] - origins) * inv_d
    t_lo = jnp.minimum(t_a, t_b)
    t_hi = jnp.maximum(t_a, t_b)

    t_near = jnp.max(t_lo, axis=-1, keepdims=True)  # latest entry
    t_far = jnp.min(t_hi, axis=-1, keepdims=True)  # earliest exit
    intersecting = t_near <= t_far  # non-strict, matching the reference's strict-disjoint test

    orig_bounds = jnp.broadcast_to(
        jnp.array([bounds.near, bounds.far], dtype=dtype)[None, :], (num_rays, 2)
    )
    aabb_bounds = jnp.concatenate([t_near, t_far], axis=-1)
    final_bounds = jnp.where(intersecting, aabb_bounds, orig_bounds)
    final_bounds = jnp.clip(final_bounds, min=0.0)
    return final_bounds, intersecting


def sample_aabb_bound_uniform_points_on_rays(
    rays: Rays,
    bounds: CameraBounds,
    num_samples: int,
    aabb: AxisAlignedBoundingBox,
    key: Optional[jax.Array] = None,
    perturb: bool = True,
) -> SampledPointsOnRays:
    """AABB-clipped uniform sampling (sample.py:187-202)."""
    per_ray_bounds, _ = ray_aabb_intersection(rays, bounds, aabb)
    return sample_uniform_points_on_rays(
        rays, bounds=per_ray_bounds, num_samples=num_samples, key=key, perturb=perturb
    )
