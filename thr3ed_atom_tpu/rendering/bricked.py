"""Bricked (slab-march) render procedure: pose-level orchestration of the fused
Pallas kernel in ops/pallas/slab_march.py.

This is the TPU-native replacement for the whole per-sample render pipeline of the
reference (thre3d_atom/thre3d_reprs/voxels.py:295-321 double grid_sample ->
rendering/volumetric/process.py:20 SH shading -> accumulate.py:49-88 compositing).
Instead of gathering 8 grid corners per sample from HBM, the grid is repacked ONCE per
camera pose into front-to-back *slabs* along the pose's dominant axis, and a single
kernel launch marches every 16x16-pixel tile of the image through the occupied slabs.

Sampling semantics: one sample per slab crossing (the x-cell-center planes), where
in-plane bilinear interpolation is EXACTLY the trilinear interpolant of the grid. The
sample count per ray is therefore the geometric ~N..sqrt(3)N instead of the reference's
fixed `num_samples_per_ray`; quality equivalence vs the exact renderer is pinned by
tests/test_bricked.py (same points, same interpolant) and by trained-scene PSNR tests.

Pipeline per pose (all jitted):
  1. ``prepare_bricked_grid``   - slab-average + repack to [XG, U, V, GS*32] bf16,
                                  plus a dilated occupancy mip for empty-space skipping
  2. ``compute_ray_features``   - per-ray affine slab-march coefficients + SH basis
  3. ``build_tables``           - per-tile front-to-back lists of occupied patch DMAs
  4. ``slab_march_render``      - the fused kernel (one launch for the whole image)
  5. un-tile + white background / disparity postprocessing
"""
from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from thr3ed_atom_tpu.models.voxels import VoxelGrid
from thr3ed_atom_tpu.ops.pallas.slab_march import (
    GS,
    L_AT,
    L_AU,
    L_AV,
    L_BT,
    L_BU,
    L_BV,
    L_DELTA,
    L_JMAX,
    L_JMIN,
    L_Y0,
    LAN,
    LANES_PER_SLAB,
    PU,
    PV,
    RAY_LANES,
    slab_march_render,
)
from thr3ed_atom_tpu.ops.sh import C0, C1, C2
from thr3ed_atom_tpu.rendering.interface import RenderOut
from thr3ed_atom_tpu.utils.constants import (
    EXTRA_ACCUMULATED_WEIGHTS,
    EXTRA_BRICKED_TAP_OVERFLOW,
    EXTRA_DIFFUSE_COLOUR,
    EXTRA_DISPARITY,
    ZERO_PLUS,
)


class BrickedStatics(NamedTuple):
    """Hashable statics selecting one compiled bricked-render program."""

    dims: Tuple[int, int, int]  # grid vertex counts (W, D, H)
    aabb: Tuple[Tuple[float, float], Tuple[float, float], Tuple[float, float]]
    axis: int  # dominant world axis the slabs march along
    flip: bool  # True when the pose looks toward decreasing `axis`
    ncoeff: int  # SH coefficients per colour
    relu_sigma: bool  # density post-activation is relu (else identity)
    exit_eps: float  # early-exit transmittance threshold
    occ_sigma_thresh: float  # occupancy-mip density threshold for group skipping
    with_diffuse: bool
    tile_px: int  # pixel tile edge (rays per tile = tile_px^2)
    interpret: bool  # run the kernel in interpreter mode (CPU tests)
    # K samples per cell along the march axis (quadrature refinement; must divide
    # GS). K=1 samples cell centers; K>1 subdivides each crossing K ways, halving/
    # quartering the compositing step so the integral approaches the continuum.
    axis_supersample: int = 1


def _uv_axes(axis: int) -> Tuple[int, int]:
    others = [0, 1, 2]
    others.remove(axis)
    return others[0], others[1]


def _slab_geometry(statics: BrickedStatics):
    """Static slab/patch geometry derived from the grid dims and the march axis."""
    dims, aabb, axis = statics.dims, statics.aabb, statics.axis
    u_ax, v_ax = _uv_axes(axis)
    num_slabs = (dims[axis] - 1) * statics.axis_supersample  # SAMPLES along axis
    num_groups = -(-num_slabs // GS)
    u_real, v_real = dims[u_ax], dims[v_ax]
    u_pad = max(u_real, PU)
    v_pad = max(-(-v_real // 8) * 8, PV)
    scales = tuple(
        dims[i] / (aabb[i][1] - aabb[i][0]) for i in range(3)
    )  # world -> continuous vertex coordinate scale per axis
    return u_ax, v_ax, num_slabs, num_groups, u_real, v_real, u_pad, v_pad, scales


def statics_for_grid(
    voxel_grid: VoxelGrid,
    axis: int,
    flip: bool,
    *,
    exit_eps: float = 1e-4,
    occupancy_alpha_thresh: float = 1e-4,
    with_diffuse: bool = False,
    tile_px: int = 0,
    interpret: bool = False,
    axis_supersample: int = 0,
) -> BrickedStatics:
    num_features = voxel_grid.num_features
    assert num_features % 3 == 0, "SH feature count must be 3 * (degree + 1)^2"
    ncoeff = num_features // 3
    assert ncoeff <= 9, "bricked renderer supports SH degree <= 2 (32-lane slabs)"
    assert int(round(ncoeff**0.5)) ** 2 == ncoeff
    post = voxel_grid.density_postactivation
    assert post in ("identity", "relu"), (
        f"bricked renderer supports identity/relu density postactivation, got {post}"
    )
    assert voxel_grid.feature_postactivation == "identity"
    aabb = voxel_grid.aabb
    dims = voxel_grid.grid_dims
    if axis_supersample == 0:
        # AUTO: constant world-space quadrature across grid resolutions - target
        # ~256 march samples across the grid (the reference recipe's effective
        # in-grid sampling density), clamped to [1, GS]. Coarse stages supersample
        # (32^3 -> K=4, 128^3 -> K=2); at 256^3 K=1 already meets the target and
        # keeps the repack + gradient buffers inside HBM.
        axis_supersample = max(1, min(GS, round(256 / max(1, dims[axis] - 1))))
    # convert the per-sample alpha threshold to a density threshold: delta per slab
    # crossing is cell_a * ||d|| / |d_a| in [cell_a, sqrt(3) * cell_a] for the
    # dominant axis, so alpha <= sigma * sqrt(3) * cell_a for small alpha
    cell_a = (aabb[axis][1] - aabb[axis][0]) / dims[axis] / axis_supersample
    occ_sigma_thresh = occupancy_alpha_thresh / (cell_a * math.sqrt(3.0))
    if tile_px == 0:
        # a 16px tile's in-plane footprint (tile spread + GS-1 drift + 2 bilinear
        # taps) fits the 16x24 patch up to ~160^3 grids at typical NeRF FOVs;
        # finer grids use 8px tiles (half the spread). build_tables still checks
        # actual coverage and reports overflow.
        tile_px = 16 if max(dims) <= 160 else 8
    assert tile_px in (8, 16), tile_px
    return BrickedStatics(
        dims=tuple(dims),
        aabb=tuple((float(lo), float(hi)) for (lo, hi) in aabb),
        axis=axis,
        flip=bool(flip),
        ncoeff=ncoeff,
        relu_sigma=(post == "relu"),
        exit_eps=float(exit_eps),
        occ_sigma_thresh=float(occ_sigma_thresh),
        with_diffuse=bool(with_diffuse),
        tile_px=int(tile_px),
        interpret=bool(interpret),
        axis_supersample=int(axis_supersample),
    )


def dominant_axis_for_pose(rotation: np.ndarray) -> Tuple[int, bool]:
    """March axis + flip from the camera's forward direction (-R[:, 2] in the
    OpenGL-style convention used by rays.cast_rays)."""
    forward = -np.asarray(rotation).reshape(3, 3)[:, 2]
    axis = int(np.argmax(np.abs(forward)))
    return axis, bool(forward[axis] < 0.0)


# -------------------------------------------------------------------- grid repacking


def repack_slab_grid(
    voxel_grid: VoxelGrid, statics: BrickedStatics, theta: jnp.ndarray | float = 0.5
):
    """Differentiable repack of the (pre-activated) grid into front-to-back slabs.

    ``theta`` in (0, 1) is the sample offset between adjacent vertex planes along
    the march axis (0.5 = cell centers). The lerp (1-theta)*plane[j] +
    theta*plane[j+1] IS the trilinear interpolant at physical position
    j + theta (non-flipped) / (S - 1 - j) + (1 - theta) (flipped) — a per-step
    random theta restores stratified sampling along the march axis for training.

    Returns repacked [XG, U_pad, V_pad, GS*32] bf16 — lane block b holds slab
    (g*GS + b)'s 32 channels (features ++ density ++ zero pad).
    """
    (u_ax, v_ax, num_slabs, num_groups, _u_real, _v_real, u_pad, v_pad, _scales
     ) = _slab_geometry(statics)

    pre_densities, pre_features = voxel_grid.activated_grids()
    unified = jnp.concatenate([pre_features, pre_densities], axis=-1)
    pad_ch = LANES_PER_SLAB - unified.shape[-1]
    unified = jnp.pad(unified, ((0, 0), (0, 0), (0, 0), (0, pad_ch)))

    # lerp along the march axis FIRST, in the grid's native layout, writing bf16
    # directly: one streaming pass over the f32 input instead of lerping a
    # transposed f32 copy, and every later layout pass moves half the bytes
    # (measured 6.6 ms -> ~3 ms for a 128^3 repack)
    theta = jnp.asarray(theta, jnp.float32)
    ssaa = statics.axis_supersample
    num_cells = num_slabs // ssaa
    lo = jax.lax.slice_in_dim(unified, 0, num_cells, axis=statics.axis)
    hi = jax.lax.slice_in_dim(unified, 1, num_cells + 1, axis=statics.axis)
    # sample j' of the march sits at continuous vertex coordinate (j' + theta) / K
    # (non-flipped) or (num_slabs - j' - theta) / K (flipped); within cell c the
    # K sub-samples use fractions (k + theta) / K — flipped fractions mirror to
    # (k + 1 - theta) / K so flipping the interleaved array lands on those
    # positions exactly (K = 1 reduces to the single cell-center lerp)
    subs = []
    for k in range(ssaa):
        frac = (k + (1.0 - theta if statics.flip else theta)) / ssaa
        sub = ((1.0 - frac) * lo + frac * hi).astype(jnp.bfloat16)
        if statics.flip:
            sub = jnp.flip(sub, axis=statics.axis)
        subs.append(jnp.transpose(sub, (statics.axis, u_ax, v_ax, 3)))
    if ssaa == 1:
        slabs = subs[0]  # [S, U, V, 32] bf16, slab-major
    else:
        # interleave AFTER the per-sub transpose by stacking on a new axis right
        # after the (now leading) slab axis and merging the two LEADING dims.
        # (Interleaving before the transpose — stack at axis+1 + reshape + flip +
        # transpose in one jitted graph — miscompiles on the TPU backend at some
        # shapes: measured 667K wrong values at 128^3 K=2 while the same ops run
        # eagerly are exact. Leading-dim merges are the safe pattern.)
        # flipped interleave order: flipped[j'] = native[S_K-1-j'], i.e. cells
        # reversed AND sub-samples reversed within each cell
        if statics.flip:
            subs = subs[::-1]
        slabs = jnp.stack(subs, axis=1).reshape(
            (num_cells * ssaa,) + subs[0].shape[1:]
        )

    s_pad = num_groups * GS
    slabs = jnp.pad(
        slabs,
        (
            (0, s_pad - num_slabs),
            (0, u_pad - slabs.shape[1]),
            (0, v_pad - slabs.shape[2]),
            (0, 0),
        ),
    )
    return (
        slabs.reshape(num_groups, GS, u_pad, v_pad, LANES_PER_SLAB)
        .transpose(0, 2, 3, 1, 4)
        .reshape(num_groups, u_pad, v_pad, GS * LANES_PER_SLAB)
    )


def occupancy_mip(voxel_grid: VoxelGrid, statics: BrickedStatics) -> jnp.ndarray:
    """Dilated occupancy mip [XG, U8, V8]: max pre-activated density over each
    (slab group, 8x8 vertex block). Group g covers march samples [g*GS, g*GS+GS),
    i.e. cells [g*GS_c, (g+1)*GS_c) with GS_c = GS / axis_supersample, so the max
    is over vertex planes g*GS_c..(g+1)*GS_c (one plane of overlap) and
    upper-bounds the sample densities for ANY theta. A patch anchored at (u0, v0)
    is fully covered by the mip cell (u0 // 8, v0 // 8)."""
    (u_ax, v_ax, num_slabs, num_groups, _u_real, _v_real, u_pad, v_pad, _scales
     ) = _slab_geometry(statics)
    gs_c = GS // statics.axis_supersample
    assert gs_c * statics.axis_supersample == GS, (
        f"axis_supersample must divide GS={GS}, got {statics.axis_supersample}"
    )
    pre_densities, _ = voxel_grid.activated_grids()
    dens = jnp.transpose(pre_densities[..., 0], (statics.axis, u_ax, v_ax))
    if statics.flip:
        dens = dens[::-1]
    u8 = -(-u_pad // 8)
    v8 = -(-v_pad // 8)
    a_pad = num_groups * gs_c + 1
    dens = jnp.pad(
        dens,
        (
            (0, a_pad - dens.shape[0]),
            (0, u8 * 8 - dens.shape[1]),
            (0, v8 * 8 - dens.shape[2]),
        ),
    )
    # group g covers cells [g*GS_c, (g+1)*GS_c) -> vertex planes [g*GS_c, (g+1)*GS_c]
    main = jnp.max(
        dens[:-1].reshape(num_groups, gs_c, u8, 8, v8, 8), axis=(1, 3, 5)
    )
    extra = jnp.max(
        dens[gs_c::gs_c].reshape(num_groups, 1, u8, 8, v8, 8), axis=(1, 3, 5)
    )
    occ = jnp.maximum(main, extra)  # [XG, U8, V8]
    # forward dilation must cover the worst-case tap footprint from a patch anchor:
    # u0 is unaligned so a PU=24 tap span can cross ceil(24/8)+1 = 4 blocks, and the
    # 8-aligned v0 with PV=32 spans exactly 4 blocks — 3x3 would miss the last block
    du = PU // 8 + 1
    dv = PV // 8
    neg = jnp.full_like(occ[:, : du - 1], -jnp.inf)
    occ_p = jnp.concatenate([occ, neg], axis=1)
    occ_p = jnp.concatenate(
        [occ_p, jnp.full_like(occ_p[:, :, : dv - 1], -jnp.inf)], axis=2
    )
    return jnp.max(
        jnp.stack(
            [occ_p[:, i:i + u8, j:j + v8] for i in range(du) for j in range(dv)]
        ),
        axis=0,
    )


@partial(jax.jit, static_argnums=(1,))
def prepare_bricked_grid(voxel_grid: VoxelGrid, statics: BrickedStatics):
    """(repacked slab grid at theta=0.5, dilated occupancy mip) — the per-pose
    precomputation of the inference render path."""
    return repack_slab_grid(voxel_grid, statics), occupancy_mip(voxel_grid, statics)


# -------------------------------------------------------------------- ray features


def _sh_basis(viewdirs: jnp.ndarray, ncoeff: int) -> jnp.ndarray:
    """SH basis values Y_i(dir) matching ops/sh.py's evaluation ladder: [..., ncoeff]."""
    x, y, z = viewdirs[..., 0], viewdirs[..., 1], viewdirs[..., 2]
    ys = [jnp.full_like(x, C0)]
    if ncoeff > 1:
        ys += [-C1 * y, C1 * z, -C1 * x]
    if ncoeff > 4:
        xx, yy, zz = x * x, y * y, z * z
        ys += [
            C2[0] * x * y,
            C2[1] * y * z,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * x * z,
            C2[4] * (xx - yy),
        ]
    return jnp.stack(ys, axis=-1)


def compute_ray_features(
    origins: jnp.ndarray,  # [T, R, 3] world-space ray origins
    directions: jnp.ndarray,  # [T, R, 3] (not necessarily unit)
    statics: BrickedStatics,
    theta: jnp.ndarray | float = 0.5,  # slab sample offset, matching the repack
) -> jnp.ndarray:  # [T, R, RAY_LANES] f32
    """Per-ray affine slab-march coefficients in repack space.

    In repack space slab j sits at continuous vertex coordinate t_axis = j + 0.5
    (physical k = S-1-j when flipped); the ray's world depth s(j), in-plane vertex
    coordinates u(j), v(j) are all affine in j. jmin/jmax bound the slabs whose
    sample point is strictly inside the AABB and in front of the camera — outside
    samples have zero density in the exact renderer (voxels.py test_inside_volume),
    here they are masked in-kernel.
    """
    (u_ax, v_ax, num_slabs, _num_groups, u_real, v_real, _u_pad, _v_pad, scales
     ) = _slab_geometry(statics)
    axis = statics.axis
    lo = [statics.aabb[i][0] for i in range(3)]

    o_a = origins[..., axis]
    d_a = directions[..., axis]
    d_a = jnp.where(jnp.abs(d_a) < 1e-12, 1e-12, d_a)

    # repack sample j sits at continuous vertex coordinate (j + theta) / K
    # (non-flipped) / (num_slabs - j - theta) / K (flipped), K = axis_supersample;
    # world w(t) = lo + (t + 0.5) / scale
    theta = jnp.asarray(theta, jnp.float32)
    ssaa = statics.axis_supersample
    inv_scale = 1.0 / scales[axis]
    step = inv_scale / ssaa  # world step along `axis` per march sample
    ds = step / d_a
    if statics.flip:
        w0 = lo[axis] + ((num_slabs - theta) / ssaa + 0.5) * inv_scale
        at = (w0 - o_a) / d_a
        bts = -ds
    else:
        w0 = lo[axis] + (theta / ssaa + 0.5) * inv_scale
        at = (w0 - o_a) / d_a
        bts = ds
    # rays marching against the repack direction never produce valid samples
    forwardish = bts > 0.0

    def affine_uv(ax):
        scale = scales[ax]
        a0 = (origins[..., ax] - lo[ax]) * scale - 0.5 + at * directions[..., ax] * scale
        b0 = bts * directions[..., ax] * scale
        return a0, b0

    au, bu = affine_uv(u_ax)
    av, bv = affine_uv(v_ax)

    def interval(a0, b0, n_real):
        b_safe = jnp.where(jnp.abs(b0) < 1e-12, 1e-12, b0)
        e0 = (-0.5 - a0) / b_safe
        e1 = (n_real - 0.5 - a0) / b_safe
        return jnp.minimum(e0, e1), jnp.maximum(e0, e1)

    lo_u, hi_u = interval(au, bu, u_real)
    lo_v, hi_v = interval(av, bv, v_real)
    # s(j) > 0: j > -at / bts (bts > 0 for live rays)
    lo_s = -at / jnp.where(jnp.abs(bts) < 1e-12, 1e-12, bts)

    jminf = jnp.maximum(jnp.maximum(lo_u, lo_v), jnp.maximum(lo_s, 0.0))
    jmaxf = jnp.minimum(jnp.minimum(hi_u, hi_v), float(num_slabs - 1))
    jmaxf = jnp.where(forwardish, jmaxf, -1.0)
    jminf = jnp.where(forwardish, jminf, 0.0)

    norm = jnp.linalg.norm(directions, axis=-1)
    delta_w = bts * norm

    ybasis = _sh_basis(directions / norm[..., None], statics.ncoeff)  # [T, R, nc]
    ytile = jnp.tile(ybasis, (1, 1, 3))  # lanes c < 3 * ncoeff: Y_{c % ncoeff}
    ytile = jnp.pad(
        ytile, ((0, 0), (0, 0), (0, LANES_PER_SLAB - ytile.shape[-1]))
    )

    # one stack+concat (lane order must match the L_* constants) — building via
    # repeated .at[].set materializes a full copy per lane on TPU
    head = jnp.stack(
        [au, bu, av, bv, at, bts, jminf, jmaxf, delta_w], axis=-1
    ).astype(jnp.float32)
    pad = jnp.zeros((*origins.shape[:2], L_Y0 - 9), jnp.float32)
    return jnp.concatenate([head, pad, ytile.astype(jnp.float32)], axis=-1)


# -------------------------------------------------------------------- tables


# slab-subrange candidates per group for overflow splitting (GS = 4): a group whose
# footprint exceeds the patch is split front-to-back into halves, and a half that
# still exceeds it into single slabs. Candidate order is strictly front-to-back for
# every legal emission combination.
_SUB_RANGES = ((0, 3), (0, 1), (2, 3), (0, 0), (1, 1), (2, 2), (3, 3))
_SUB_ORDER = (0, 1, 4, 2, 3, 5, 6)  # emission-order key offset of each candidate
# lattice of rays sampled per tile when bounding the footprint (span extremes of the
# quasi-affine u(j; px, py) over a tile sit near the boundary; interior points guard
# the tiny curvature, and _SPAN_MARGIN absorbs the residual)
_SPAN_MARGIN = 0.25


def _lattice_indices(tile_px: int):
    q = [0, tile_px // 3, (2 * tile_px) // 3, tile_px - 1]
    return jnp.asarray(
        [r * tile_px + c for r in q for c in q], dtype=jnp.int32
    )


def build_tables(
    rays_feat: jnp.ndarray,  # [T, R, RAY_LANES]
    occ_dil: jnp.ndarray,  # [G_range, U8, V8] dilated occupancy mip (local slice)
    statics: BrickedStatics,
    exact_spans: bool = False,  # bound footprints with ALL rays (tests) vs lattice
    group_range=None,  # (g0, g1) restricts to a depth segment (sample parallelism)
):
    """Per-tile compacted front-to-back traversal tables with overflow splitting.

    Returns (tables [T, 4 * G, 4] int32 = (GLOBAL group, u0, v0, jlo * 256 + jhi),
    counts [T, 1] int32, overflow bool — True only when even a SINGLE slab's
    footprint exceeds the patch, i.e. the pose needs smaller tiles).
    """
    (u_ax, v_ax, _num_slabs, total_groups, u_real, v_real, u_pad, v_pad, _scales
     ) = _slab_geometry(statics)
    # the LOCAL group count must be static (it sets table shapes) so it comes
    # from occ_dil's leading dim; the offset may be a tracer (axis_index under
    # shard_map)
    num_groups = occ_dil.shape[0]
    g0 = 0 if group_range is None else group_range[0]
    if group_range is None:
        assert num_groups == total_groups, (occ_dil.shape, total_groups)

    if exact_spans:
        sel = rays_feat
    else:
        sel = rays_feat[:, _lattice_indices(statics.tile_px), :]

    au = sel[..., L_AU][..., None, None]  # [T, B, 1, 1]
    bu = sel[..., L_BU][..., None, None]
    av = sel[..., L_AV][..., None, None]
    bv = sel[..., L_BV][..., None, None]
    jminf = sel[..., L_JMIN][..., None, None]
    jmaxf = sel[..., L_JMAX][..., None, None]

    g_iota = (
        g0 + jnp.arange(num_groups, dtype=jnp.float32)[None, None, :, None]
    )  # GLOBAL group indices
    sub = jnp.asarray(_SUB_RANGES, dtype=jnp.float32)  # [C, 2]
    glo = g_iota * GS + sub[None, None, None, :, 0]  # [1, 1, G, C]
    ghi = g_iota * GS + sub[None, None, None, :, 1]
    live = (jminf <= ghi) & (jmaxf >= glo) & (jminf <= jmaxf)  # [T, B, G, C]

    j_a = jnp.clip(glo, jminf, jmaxf)
    j_b = jnp.clip(ghi, jminf, jmaxf)

    big = jnp.float32(1e9)

    def span(a0, b0):
        ea = a0 + b0 * j_a
        eb = a0 + b0 * j_b
        lo_t = jnp.min(jnp.where(live, jnp.minimum(ea, eb), big), axis=1)
        hi_t = jnp.max(jnp.where(live, jnp.maximum(ea, eb), -big), axis=1)
        return lo_t - _SPAN_MARGIN, hi_t + _SPAN_MARGIN  # [T, G, C]

    ulo, uhi = span(au, bu)
    vlo, vhi = span(av, bv)
    any_live = jnp.any(live, axis=1)  # [T, G, C]

    u0 = jnp.clip(jnp.floor(ulo), 0.0, float(u_pad - PU)).astype(jnp.int32)
    v0 = (jnp.clip(jnp.floor(vlo), 0.0, float(v_pad - PV)).astype(jnp.int32) // 8) * 8
    u0 = jnp.where(any_live, u0, 0)
    v0 = jnp.where(any_live, v0, 0)

    # coverage: every needed REAL vertex tap must fall inside the patch
    need_hi_u = jnp.minimum(jnp.floor(uhi) + 1.0, float(u_real - 1))
    need_hi_v = jnp.minimum(jnp.floor(vhi) + 1.0, float(v_real - 1))
    fits = (
        (need_hi_u <= u0.astype(jnp.float32) + (PU - 1))
        & (need_hi_v <= v0.astype(jnp.float32) + (PV - 1))
    )  # [T, G, C]

    occ_val = occ_dil[
        jnp.arange(num_groups)[None, :, None], u0 // 8, v0 // 8
    ]  # [T, G, C] — occ_dil is the LOCAL slice, indexed by local group
    occupied = occ_val > statics.occ_sigma_thresh

    f_full, f_h0, f_h1 = fits[..., 0], fits[..., 1], fits[..., 2]
    # selection: full if it fits; else per half: the half if it fits, else its slabs
    use = jnp.stack(
        [
            f_full,
            ~f_full & f_h0,
            ~f_full & f_h1,
            ~f_full & ~f_h0,
            ~f_full & ~f_h0,
            ~f_full & ~f_h1,
            ~f_full & ~f_h1,
        ],
        axis=-1,
    )
    active = use & any_live & occupied  # [T, G, C]
    # overflow only when an emitted SINGLE slab still exceeds the patch
    overflow = jnp.any(active[..., 3:] & ~fits[..., 3:])

    num_tiles = active.shape[0]
    cand = num_groups * len(_SUB_RANGES)
    order_off = jnp.asarray(_SUB_ORDER, dtype=jnp.int32)[None, None, :]
    key = jnp.where(
        active,
        jnp.arange(num_groups, dtype=jnp.int32)[None, :, None] * 8 + order_off,
        8 * num_groups + 7,
    ).reshape(num_tiles, cand)
    order = jnp.argsort(key, axis=-1)[:, : 4 * num_groups]

    g_col = jnp.broadcast_to(
        g0 + jnp.arange(num_groups, dtype=jnp.int32)[None, :, None], active.shape
    ).reshape(num_tiles, cand)
    jpack = (
        jnp.asarray([lo * 256 + hi for (lo, hi) in _SUB_RANGES], dtype=jnp.int32)[
            None, None, :
        ]
        * jnp.ones((1, num_groups, 1), jnp.int32)
    ).reshape(1, cand)
    jpack = jnp.broadcast_to(jpack, (num_tiles, cand))

    def pick(x):
        return jnp.take_along_axis(x.reshape(num_tiles, cand), order, axis=-1)

    tables = jnp.stack(
        [
            jnp.take_along_axis(g_col, order, axis=-1),
            pick(u0),
            pick(v0),
            jnp.take_along_axis(jpack, order, axis=-1),
        ],
        axis=-1,
    ).astype(jnp.int32)
    counts = jnp.sum(active, axis=(1, 2), dtype=jnp.int32)[:, None]
    return tables, counts, overflow


# -------------------------------------------------------------------- image renderer


def _tile_image_rays(height_pad, width_pad, focal, height, width, rotation,
                     translation, tile_px):
    """Cast rays for a padded image and regroup them into square pixel tiles.

    Pixel centers / focal match rays.cast_rays for the REAL (height, width); the pad
    pixels are extra off-frame rays that get cropped after rendering.
    """
    x = jnp.arange(width_pad, dtype=jnp.float32) + 0.5
    y = jnp.arange(height_pad, dtype=jnp.float32) + 0.5
    xg, yg = jnp.meshgrid(x, y, indexing="xy")
    dirs_cam = jnp.stack(
        [(xg - width * 0.5) / focal, -(yg - height * 0.5) / focal, -jnp.ones_like(xg)],
        axis=-1,
    )
    rays_d = jnp.einsum("ij,hwj->hwi", rotation, dirs_cam,
                        precision=jax.lax.Precision.HIGHEST)
    rays_o = jnp.broadcast_to(translation.reshape(3), rays_d.shape)

    th, tw = height_pad // tile_px, width_pad // tile_px

    def tile(a):
        return (
            a.reshape(th, tile_px, tw, tile_px, 3)
            .transpose(0, 2, 1, 3, 4)
            .reshape(th * tw, tile_px * tile_px, 3)
        )

    return tile(rays_o), tile(rays_d)


def _untile(out: jnp.ndarray, height_pad: int, width_pad: int, tile_px: int
            ) -> jnp.ndarray:
    th, tw = height_pad // tile_px, width_pad // tile_px
    c = out.shape[-1]
    return (
        out.reshape(th, tw, tile_px, tile_px, c)
        .transpose(0, 2, 1, 3, 4)
        .reshape(height_pad, width_pad, c)
    )


@partial(jax.jit, static_argnums=(0, 1, 2, 3, 4, 5))
def _render_image_jit(
    statics: BrickedStatics,
    height: int,
    width: int,
    focal: float,
    white_bkgd: bool,
    want_diffuse: bool,
    repacked: jnp.ndarray,
    occ_dil: jnp.ndarray,
    rotation: jnp.ndarray,
    translation: jnp.ndarray,
):
    tile_px = statics.tile_px
    height_pad = -(-height // tile_px) * tile_px
    width_pad = -(-width // tile_px) * tile_px
    rays_o, rays_d = _tile_image_rays(
        height_pad, width_pad, focal, height, width, rotation, translation, tile_px
    )
    rays_feat = compute_ray_features(rays_o, rays_d, statics)
    tables, counts, overflow = build_tables(rays_feat, occ_dil, statics)
    out = slab_march_render(
        tables,
        counts,
        rays_feat,
        repacked,
        ncoeff=statics.ncoeff,
        relu_sigma=statics.relu_sigma,
        exit_eps=statics.exit_eps,
        with_diffuse=statics.with_diffuse,
        interpret=statics.interpret,
    )
    img = _untile(out, height_pad, width_pad, tile_px)[:height, :width]
    colour = img[..., 0:3]
    acc = img[..., 3:4]
    depth = img[..., 4:5]
    if white_bkgd:
        colour = colour + (1.0 - acc)
    disparity = 1.0 / jnp.maximum(
        ZERO_PLUS, depth / jnp.maximum(acc, ZERO_PLUS)
    )
    # lazy diagnostic (device scalar, NO host sync — the tunnel round-trip is
    # ~3-25 ms, and the axon PJRT plugin has no host-callback support): True when
    # even a single-slab entry's footprint exceeded the PUxPV patch and taps were
    # dropped — extreme FOV or a grid finer than the tile size supports; set
    # bricked_tile_px=8 in that case
    extra = {
        EXTRA_DISPARITY: disparity,
        EXTRA_ACCUMULATED_WEIGHTS: acc,
        EXTRA_BRICKED_TAP_OVERFLOW: overflow,
    }
    if want_diffuse:
        diffuse = img[..., 5:8]
        if white_bkgd:
            diffuse = diffuse + (1.0 - acc)
        extra[EXTRA_DIFFUSE_COLOUR] = diffuse
    return RenderOut(colour=colour, depth=depth, extra=extra)


def render_image_bricked(
    voxel_grid: VoxelGrid,
    camera_pose,
    camera_intrinsics,
    config,
    key: Optional[jax.Array] = None,
    cache: Optional[dict] = None,
    interpret: Optional[bool] = None,
) -> RenderOut:
    """Full-image render via the slab-march kernel (pose-level API).

    The per-pose repacked grid is cached in ``cache`` (keyed by march axis/flip,
    invalidated when the grid arrays change) — orbits re-use at most 6 repacks.
    """
    del key  # deterministic: sampling is at fixed slab crossings
    rotation = np.asarray(camera_pose.rotation).reshape(3, 3)
    axis, flip = dominant_axis_for_pose(rotation)
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    want_diffuse = bool(
        getattr(config, "also_render_diffuse", False)
        or getattr(config, "render_diffuse", False)
    )
    statics = statics_for_grid(
        voxel_grid,
        axis,
        flip,
        exit_eps=config.bricked_exit_eps,
        occupancy_alpha_thresh=config.bricked_occupancy_alpha_thresh,
        with_diffuse=want_diffuse,
        tile_px=getattr(config, "bricked_tile_px", 0),
        interpret=interpret,
        axis_supersample=getattr(config, "bricked_axis_supersample", 1),
    )

    prepared = None
    if cache is not None:
        entry = cache.get((axis, flip, statics.occ_sigma_thresh, statics.axis_supersample))
        if (
            entry is not None
            and entry[0] is voxel_grid.densities
            and entry[1] is voxel_grid.features
        ):
            prepared = entry[2]
    if prepared is None:
        prepared = prepare_bricked_grid(voxel_grid, statics)
        if cache is not None:
            cache[(axis, flip, statics.occ_sigma_thresh, statics.axis_supersample)] = (
                voxel_grid.densities,
                voxel_grid.features,
                prepared,
            )
    repacked, occ_dil = prepared

    return _render_image_jit(
        statics,
        int(camera_intrinsics.height),
        int(camera_intrinsics.width),
        float(camera_intrinsics.focal),
        bool(config.white_bkgd),
        want_diffuse,
        repacked,
        occ_dil,
        jnp.asarray(rotation, jnp.float32),
        jnp.asarray(np.asarray(camera_pose.translation), jnp.float32).reshape(3),
    )


class _BrickedProcedure:
    """RENDER_PROCEDURES entry: bricked rendering is pose-structured — whole-pose
    renders go through render_image (VolumetricModel.render dispatches there, and
    the tile-based trainer drives the kernel directly). Arbitrary flat ray sets
    (reference render_interface.py:103-134 semantics) are served by an explicit,
    logged switch to the fast two-phase procedure, which shares the grid's
    activation/SH conventions exactly."""

    prepare = None
    render_image = staticmethod(render_image_bricked)
    _warned_flat_rays = False

    def __call__(self, voxel_grid, rays, render_config, key=None, prepared=None):
        from thr3ed_atom_tpu.rendering.fast_renderer import (
            render_sh_voxel_grid_fast,
        )
        from thr3ed_atom_tpu.utils.logging import log

        if not _BrickedProcedure._warned_flat_rays:
            log.info(
                "render_sh_voxel_grid_bricked: flat ray batch requested; the "
                "slab-march kernel is pose-structured, routing these rays "
                "through render_sh_voxel_grid_fast (whole-pose renders keep "
                "the bricked kernel)"
            )
            _BrickedProcedure._warned_flat_rays = True
        return render_sh_voxel_grid_fast(voxel_grid, rays, render_config, key)


render_sh_voxel_grid_bricked = _BrickedProcedure()
