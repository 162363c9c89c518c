"""Hierarchical (coarse-to-fine) importance sampling along rays.

The reference ships only the "most basic" uniform sampler (its sample.py:22-24 cites the
OG NeRF repo, whose hierarchical sampler it omits). On TPU the renderer is bound by
gather rows per sample (DESIGN_NOTES.md), so importance sampling is a throughput
feature as much as a quality one: a coarse density-only pass at S_c samples guides an
inverse-CDF draw of S_f fine samples, concentrating the expensive queries where the
transmittance weight lives. S_c + S_f ~ S/2 matches the quality of S uniform samples on
typical scenes.

``render_sh_voxel_grid_hierarchical`` reuses the two-phase machinery of
rendering/fast_renderer.py with the combined (sorted) coarse+fine sample set.
"""
from typing import Optional

import jax
import jax.numpy as jnp

from thr3ed_atom_tpu.utils.constants import ZERO_PLUS


def sample_pdf(
    key: Optional[jax.Array],
    bins: jnp.ndarray,  # [R, B+1] bin edges (ascending)
    weights: jnp.ndarray,  # [R, B] unnormalized bin weights
    num_samples: int,
    deterministic: bool = False,
) -> jnp.ndarray:
    """Inverse-CDF sampling of ``num_samples`` depths per ray (the classic NeRF
    sample_pdf, vectorized with searchsorted). Returns [R, num_samples], unsorted."""
    weights = weights + 1e-5  # avoid degenerate pdfs on empty rays
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [R, B+1]

    num_rays = bins.shape[0]
    if deterministic:
        u = jnp.linspace(0.0, 1.0 - 1e-6, num_samples)
        u = jnp.broadcast_to(u, (num_rays, num_samples))
    else:
        assert key is not None, "stochastic pdf sampling requires a PRNG key"
        u = jax.random.uniform(key, (num_rays, num_samples), maxval=1.0 - 1e-6)

    # searchsorted per ray: index of the bin whose cdf straddles u
    idx = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(cdf, u)
    below = jnp.clip(idx - 1, 0, cdf.shape[-1] - 2)
    above = jnp.clip(idx, 1, cdf.shape[-1] - 1)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = jnp.maximum(cdf_above - cdf_below, ZERO_PLUS)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def render_sh_voxel_grid_hierarchical(
    voxel_grid,
    rays,
    render_config,
    key: Optional[jax.Array] = None,
    prepared=None,
):
    """Coarse density march -> importance-resampled fine depths -> two-phase shading.

    Uses ``render_config.num_samples_per_ray`` as the TOTAL budget, split evenly
    between the coarse and fine passes; all other config semantics follow
    render_sh_voxel_grid_fast.
    """
    from thr3ed_atom_tpu.models.voxels import ACTIVATIONS
    from thr3ed_atom_tpu.ops.packed_grid import _cell_and_weights
    from thr3ed_atom_tpu.rendering.accumulate import DENSITY2OCCUPANCY
    from thr3ed_atom_tpu.rendering.fast_renderer import (
        prepare_packed_tables,
        _shade_samples,
    )
    from thr3ed_atom_tpu.rendering.sample import (
        ray_aabb_intersection,
        sample_uniform_points_on_rays,
    )
    from thr3ed_atom_tpu.utils.constants import INFINITY

    config = render_config
    if key is None:
        coarse_key = fine_key = noise_key = None
    else:
        coarse_key, fine_key, noise_key = jax.random.split(key, 3)

    total = config.num_samples_per_ray
    num_coarse = max(total // 2, 8)
    num_fine = max(total - num_coarse, 8)

    if prepared is None:
        prepared = prepare_packed_tables(
            voxel_grid,
            feature_dtype=jnp.bfloat16 if config.fast_bf16_features else None,
            pack_features=config.fast_pack_features,
        )
    packed_density, packed_features = prepared
    dims = voxel_grid.grid_dims

    # per-ray bounds (AABB-clipped when requested)
    if config.optimized_sampling:
        bounds, _ = ray_aabb_intersection(rays, config.camera_bounds, voxel_grid.aabb)
    else:
        bounds = config.camera_bounds

    def density_at(z_vals):
        points = (
            rays.origins[:, None, :] + rays.directions[:, None, :] * z_vals[..., None]
        )
        flat = points.reshape(-1, 3)
        normalized = voxel_grid.normalize_points(flat)
        cells, weights, _ = _cell_and_weights(normalized, dims)
        rows = jnp.take(packed_density, cells, axis=0)
        density = jnp.sum(rows * weights, axis=-1)
        density = ACTIVATIONS[voxel_grid.density_postactivation](density)
        inside = voxel_grid.test_inside_volume(flat)[:, 0]
        return jnp.where(inside, density, 0.0).reshape(z_vals.shape)

    # ------------------------------------------------------------------ coarse pass
    coarse = sample_uniform_points_on_rays(
        rays, bounds, num_coarse, key=coarse_key, perturb=config.perturb_sampled_points
    )
    z_coarse = coarse.depths
    density_coarse = density_at(z_coarse)
    deltas = jnp.diff(z_coarse, axis=-1)
    deltas = jnp.concatenate(
        [deltas, jnp.full_like(deltas[:, :1], INFINITY)], axis=-1
    ) * jnp.linalg.norm(rays.directions, axis=-1, keepdims=True)
    alpha = jnp.clip(
        DENSITY2OCCUPANCY[config.density2occupancy](density_coarse, deltas), 0.0, 1.0
    )
    transmittance = jnp.cumprod(1.0 - alpha, axis=-1)
    weights_coarse = alpha * jnp.concatenate(
        [jnp.ones_like(transmittance[:, :1]), transmittance[:, :-1]], axis=-1
    )

    # ------------------------------------------------------------------ fine pass
    mids = 0.5 * (z_coarse[:, 1:] + z_coarse[:, :-1])
    bins = jnp.concatenate([z_coarse[:, :1], mids, z_coarse[:, -1:]], axis=-1)
    z_fine = sample_pdf(
        fine_key,
        bins,
        jax.lax.stop_gradient(weights_coarse),
        num_fine,
        deterministic=not config.perturb_sampled_points,
    )
    z_all = jnp.sort(jnp.concatenate([z_coarse, z_fine], axis=-1), axis=-1)

    # ------------------------------------------------------------------ shade
    return _shade_samples(
        voxel_grid, rays, z_all, config, noise_key, packed_density, packed_features
    )
