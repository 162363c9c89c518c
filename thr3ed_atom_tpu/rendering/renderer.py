"""SH-voxel-grid render procedure + its hashable config.

Parity: reference thre3d_atom/thre3d_reprs/renderers.py:28-102. The config is a frozen
dataclass whose fields are all hashable statics (functions referenced by registry name),
so it can be a jit static argument; per-call overrides go through
``dataclasses.replace``-style updates (see modules/volumetric_model.py) instead of the
reference's deepcopy+setattr.
"""
import dataclasses
from functools import partial
from typing import Optional

import jax

from thr3ed_atom_tpu.models.voxels import VoxelGrid
from thr3ed_atom_tpu.rendering.accumulate import (
    DENSITY2OCCUPANCY,
    TONE_MAPS,
    accumulate_radiance_density_on_rays,
)
from thr3ed_atom_tpu.rendering.interface import Rays, RenderOut, render
from thr3ed_atom_tpu.rendering.process import process_points_with_sh_voxel_grid
from thr3ed_atom_tpu.rendering.sample import (
    sample_aabb_bound_uniform_points_on_rays,
    sample_uniform_points_on_rays,
)
from thr3ed_atom_tpu.utils.camera import CameraBounds


@dataclasses.dataclass(frozen=True)
class SHVoxGridRenderConfig:
    """Static render configuration (hashable; safe as a jit static arg)."""

    # probing config:
    num_samples_per_ray: int
    camera_bounds: CameraBounds
    perturb_sampled_points: bool = True
    optimized_sampling: bool = False

    # accumulation config (registry names, not callables):
    density2occupancy: str = "pb"
    radiance_hdr_tone_map: str = "sigmoid"
    stochastic_density_noise_std: float = 0.0
    white_bkgd: bool = False

    # misc render-mode config:
    render_diffuse: bool = False
    render_num_samples_per_ray: int = 1024
    parallel_rays_chunk_size: int = 32768

    # two-phase renderer (rendering/fast_renderer.py): number of highest-weight samples
    # per ray whose SH features are fetched and shaded
    fast_topk: int = 64
    # store the packed feature table in bfloat16: halves phase-2 gather bytes at
    # ~1e-3 colour error
    fast_bf16_features: bool = False
    # also emit the diffuse (degree-0 SH) colour in extra["diffuse_colour"] from the
    # SAME samples/weights/gathered rows — the trainer's diffuse regularization then
    # costs one extra SH truncation instead of a whole second render
    also_render_diffuse: bool = False
    # cell-pack the FEATURE table (8x memory for ~1.6x phase-2 speed). Turn OFF for
    # huge grids (256^3+: the packed table alone is ~15 GB); phase 2 then gathers the
    # 8 corners straight from the raw feature grid
    fast_pack_features: bool = True

    # bricked (slab-march kernel) renderer knobs — see rendering/bricked.py:
    # per-tile early-exit transmittance threshold (0 disables early exit)
    bricked_exit_eps: float = 1e-4
    # skip (tile, slab-group) patches whose max per-sample alpha is below this
    # (0 disables empty-space skipping)
    bricked_occupancy_alpha_thresh: float = 1e-4
    # pixel tile edge (8 or 16); 0 = auto from grid resolution
    bricked_tile_px: int = 0
    # K march samples per cell along the dominant axis (quadrature refinement:
    # K subdivides each slab crossing, approaching the continuum integral at
    # linearly higher kernel cost; must divide the kernel group size GS=4).
    # 0 = AUTO: constant world-space quadrature - K = clamp(256/cells, 1, 4), so
    # every grid resolution marches ~256 samples across the grid (the reference
    # harness's sampling density; 128^3 -> K=2, 256^3 -> K=1). Supersampling also
    # stabilizes bricked TRAINING: K=1's theta-jittered quadrature variance at
    # coarse grids acts as gradient noise that degrades quality at the recipe's
    # 0.03 learning rate (PARITY_RUN.md). K=1 fixed is the maximum-throughput
    # render mode.
    bricked_axis_supersample: int = 0
    # plane-march (analytic trapezoid kernel) positions per cell along the
    # dominant axis — the piecewise-linear density model is integrated in closed
    # form between consecutive positions (rendering/planes.py). 1 = vertex
    # planes only (maximum throughput), 2 = planes + cell centers (the quality
    # default: beats K=2 supersampling at equal interpolation count).
    # 0 = AUTO: ~256 positions across the grid (32^3 -> 8, 128^3 -> 2, 256^3 -> 1).
    planes_pos_per_cell: int = 0
    # gnomonic shear-warp renderer (rendering/gnomonic.py): positions per cell
    # (same AUTO semantics as planes_pos_per_cell) and the gnomonic texel grid's
    # supersampling factor over the output image (higher = sharper final warp).
    gnomonic_pos_per_cell: int = 0
    gnomonic_supersample: float = 1.25
    # final projective warp interpolation: 3 = separable Catmull-Rom bicubic
    # (default; C1 reconstruction, clears the bilinear warp's quality ceiling),
    # 5 = prefiltered B-spline interpolation (same 16 taps, better frequency
    # response; +0.2-0.5 dB over CR), 1 = bilinear (cheapest)
    gnomonic_warp_order: int = 3
    # warp implementation: "matmul" = two-pass scanline-matmul warp
    # (rendering/warp_matmul.py — zero gathers, matmul adjoint), "gather" =
    # per-pixel tap gathers (the oracle path), "auto" = matmul
    gnomonic_warp_impl: str = "auto"
    # per-u-block early exit threshold on transmittance for gnomonic renders
    # (0 disables; the training path always uses 0 so the VJP replay is exact)
    gnomonic_exit_eps: float = 1e-4
    # q-block width (texels, multiple of 128; 0 = whole-Qn stripes): splits the
    # composite grid's q axis so occupancy skipping and early exit act at
    # [Pb, qb] grain — on white-background scenes full-height stripes mix
    # object and sky (where T stays 1) and rarely skip. Chip A/B (v5e,
    # 128^3/400px): qb=128 renders 12% faster than stripes (7.53 vs 8.47
    # ms/pose) and trains 1.4% faster — the measured default.
    gnomonic_qb: int = 128

    def replace(self, **overrides) -> "SHVoxGridRenderConfig":
        return dataclasses.replace(self, **overrides)


def render_sh_voxel_grid(
    voxel_grid: VoxelGrid,
    rays: Rays,
    render_config: SHVoxGridRenderConfig,
    key: Optional[jax.Array] = None,
) -> RenderOut:
    """Wire sampler + SH point processor + accumulator into the 3-stage render().

    Pure function of (grid pytree, rays pytree, key); ``render_config`` must be static.
    Randomness (stratified jitter, density noise) consumes explicit subkeys.
    """
    if key is None:
        sample_key = noise_key = None
    else:
        sample_key, noise_key = jax.random.split(key)

    if render_config.optimized_sampling:
        sampler_function = partial(
            sample_aabb_bound_uniform_points_on_rays,
            aabb=voxel_grid.aabb,
            key=sample_key,
            perturb=render_config.perturb_sampled_points,
        )
    else:
        sampler_function = partial(
            sample_uniform_points_on_rays,
            key=sample_key,
            perturb=render_config.perturb_sampled_points,
        )

    point_processor_function = partial(
        process_points_with_sh_voxel_grid,
        voxel_grid=voxel_grid,
        render_diffuse=render_config.render_diffuse,
    )

    accumulator_function = partial(
        accumulate_radiance_density_on_rays,
        key=noise_key,
        stochastic_density_noise_std=render_config.stochastic_density_noise_std,
        density2occupancy=DENSITY2OCCUPANCY[render_config.density2occupancy],
        radiance_hdr_tone_map=TONE_MAPS[render_config.radiance_hdr_tone_map],
        white_bkgd=render_config.white_bkgd,
        extra_debug_info=False,
    )

    return render(
        rays,
        camera_bounds=render_config.camera_bounds,
        num_samples=render_config.num_samples_per_ray,
        sampler_fn=sampler_function,
        point_processor_fn=point_processor_function,
        accumulator_fn=accumulator_function,
    )


# registry of render procedures by name — checkpoints reference these strings
from thr3ed_atom_tpu.rendering.fast_renderer import (  # noqa: E402
    prepare_packed_tables,
    render_sh_voxel_grid_fast,
)

# procedures may expose a `prepare` hook (grid, config) -> prepared: per-grid
# precomputation (e.g. cell-packed tables) hoisted out of the per-chunk loop and cached
# across frames by the full-image renderer
def _prepare_fast(voxel_grid, config):
    import jax.numpy as jnp

    return prepare_packed_tables(
        voxel_grid,
        feature_dtype=jnp.bfloat16 if config.fast_bf16_features else None,
        pack_features=config.fast_pack_features,
    )


render_sh_voxel_grid_fast.prepare = _prepare_fast

from thr3ed_atom_tpu.rendering.hierarchical import (  # noqa: E402
    render_sh_voxel_grid_hierarchical,
)

render_sh_voxel_grid_hierarchical.prepare = _prepare_fast

from thr3ed_atom_tpu.rendering.bricked import (  # noqa: E402
    render_sh_voxel_grid_bricked,
)
from thr3ed_atom_tpu.rendering.planes import (  # noqa: E402
    render_sh_voxel_grid_planes,
)
from thr3ed_atom_tpu.rendering.gnomonic import (  # noqa: E402
    render_sh_voxel_grid_gnomonic,
)

RENDER_PROCEDURES = {
    "render_sh_voxel_grid": render_sh_voxel_grid,
    "render_sh_voxel_grid_fast": render_sh_voxel_grid_fast,
    "render_sh_voxel_grid_hierarchical": render_sh_voxel_grid_hierarchical,
    "render_sh_voxel_grid_bricked": render_sh_voxel_grid_bricked,
    "render_sh_voxel_grid_planes": render_sh_voxel_grid_planes,
    "render_sh_voxel_grid_gnomonic": render_sh_voxel_grid_gnomonic,
}
