"""Point processor: trilinear SH-voxel-grid lookup + SH evaluation + AABB masking.

Parity: reference thre3d_atom/rendering/volumetric/process.py:20-96. The reference's
optional ``batchify`` point-chunking (process.py:36-43) is unnecessary under XLA — the
whole [N*S] gather compiles into one fused kernel; memory chunking, when needed for huge
renders, happens one level up via lax.map over ray chunks.
"""
import jax.numpy as jnp

from thr3ed_atom_tpu.models.voxels import VoxelGrid
from thr3ed_atom_tpu.ops.sh import evaluate_spherical_harmonics
from thr3ed_atom_tpu.rendering.interface import (
    ProcessedPointsOnRays,
    Rays,
    SampledPointsOnRays,
)
from thr3ed_atom_tpu.utils.constants import INFINITY, NUM_COLOUR_CHANNELS


def process_points_with_sh_voxel_grid(
    sampled_points: SampledPointsOnRays,
    rays: Rays,
    voxel_grid: VoxelGrid,
    render_diffuse: bool = False,
) -> ProcessedPointsOnRays:
    """[N, S, 3] sampled points -> [N, S, 4] (raw RGB radiance ++ raw density).

    SH degree is inferred statically from the feature count as sqrt(F/3) - 1; the diffuse
    variant uses only the degree-0 coefficient (process.py:59-67). Points outside the
    grid's AABB get radiance -INFINITY (sigmoid -> 0 colour) and density 0
    (process.py:78-85).
    """
    num_rays, num_samples, num_coords = sampled_points.points.shape
    flat_points = sampled_points.points.reshape(-1, num_coords)

    interpolated = voxel_grid(flat_points)
    sh_coeffs, raw_densities = interpolated[..., :-1], interpolated[..., -1:]

    viewdirs = rays.directions / jnp.linalg.norm(
        rays.directions, axis=-1, keepdims=True
    )
    viewdirs_tiled = jnp.broadcast_to(
        viewdirs[:, None, :], (num_rays, num_samples, num_coords)
    ).reshape(-1, num_coords)

    sh_coeffs = sh_coeffs.reshape(sh_coeffs.shape[0], NUM_COLOUR_CHANNELS, -1)
    if render_diffuse:
        sh_coeffs = sh_coeffs[..., :1]
        sh_degree = 0
    else:
        sh_degree = int(round(sh_coeffs.shape[-1] ** 0.5)) - 1

    raw_radiance = evaluate_spherical_harmonics(
        degree=sh_degree, sh_coeffs=sh_coeffs, viewdirs=viewdirs_tiled
    )

    inside_mask = voxel_grid.test_inside_volume(flat_points)
    filtered_radiance = jnp.where(inside_mask, raw_radiance, -INFINITY)
    filtered_densities = jnp.where(inside_mask, raw_densities, 0.0)

    processed = jnp.concatenate([filtered_radiance, filtered_densities], axis=-1)
    processed = processed.reshape(num_rays, num_samples, -1)
    return ProcessedPointsOnRays(processed, sampled_points.depths)
