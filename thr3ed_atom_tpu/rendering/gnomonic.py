"""Gnomonic shear-warp renderer: dense per-plane resampling on the MXU.

The round-3 production render path, replacing the sparse tile-march kernels
(bricked.py / planes.py) for whole-pose rendering. Same reference semantics
being replaced: the per-sample hot path of
thre3d_atom/thre3d_reprs/voxels.py:295-321 (double grid_sample) ->
rendering/volumetric/process.py:20 (SH shading) -> accumulate.py:49-88
(compositing); same quadrature model as planes.py (analytic relu-trapezoid
between trilinear-exact position crossings).

Architecture (see experiments/proto_gnomonic*.py for the measured derivation):

  1. **Gnomonic factorization.** Pick the pose's dominant march axis; texel
     (p, q) of a "virtual axis-aligned camera" grid is the ray with direction
     ``D = g*e_axis + x_p*e_u + y_q*e_v`` (g = -1 when the camera looks down
     the axis). Every such ray crosses march position j at in-plane vertex
     coordinates that are AFFINE in (x_p, y_q) with per-plane uniform scale,
     so resampling position slices onto the texel grid is two banded-matrix
     matmuls — pure MXU work with zero gathers, and the resampled values are
     the EXACT trilinear field at real ray crossings (the in-plane restriction
     of a trilinear field is bilinear).
  2. **Batched u-resample (XLA).** ``t1[j] = Ru_j @ slice_j`` for all
     positions at once, laid out [NPos, C*Pn, nv] bf16.
  3. **Fused composite kernel (Pallas).** Streams t1 position-by-position:
     v-resample matmul in VMEM, SH fold, analytic relu-trapezoid composite.
     Carries (T, colour, acc, depth, previous plane) persist in VMEM scratch
     across grid steps, so the [C, Pn, Qn] per-plane values never touch HBM
     (the pure-XLA scan formulation is HBM-bound at ~66 MB/plane).
  4. **Projective warp.** One bilinear resample of the composited 8-channel
     image to the real camera's pixels (a plane-at-infinity homography).
     Measured 54+ dB vs per-pixel marching at supersample 1.25; the march
     itself is oracle-exact (94 dB, bf16-resample-limited).

Supersampling ``pos_per_cell`` (P) inserts P-1 interior lerp positions per
cell (the "split" quadrature that measures above K=2 axis supersampling at
equal interpolation count — experiments/quality_analytic.py); interior slices
are lerps of the vertex slices, computed in the repack, so the whole pipeline
is uniform in NPos. Deterministic: no stratified jitter anywhere.

Measured (v5e, 128^3 grid, 400x400): 10.3 ms/pose at P=1 (15.6M rays/s),
14.6 ms at P=2 (11.0M rays/s) vs 37 ms for the plane-march kernel path.
"""
from __future__ import annotations

import math
import os
from functools import partial
from typing import NamedTuple, Optional, Tuple

# Cost-attribution hook for experiments/probe_composite_cost.py --variants:
# "notrans" replaces exp/sigmoid with cheap affine stand-ins, "nofold" drops
# the SH fold's per-channel v-dots, "nou" compiles out the u-resample.
# Numerically WRONG outputs — timing probes only; unset in production/tests.
_KPROF = os.environ.get("GN_KERNEL_PROFILE", "")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from thr3ed_atom_tpu.models.voxels import VoxelGrid
from thr3ed_atom_tpu.ops.pallas.plane_march import _relu_trap
from thr3ed_atom_tpu.rendering.bricked import _uv_axes, dominant_axis_for_pose
from thr3ed_atom_tpu.rendering.interface import RenderOut
from thr3ed_atom_tpu.utils.constants import (
    EXTRA_ACCUMULATED_WEIGHTS,
    EXTRA_DIFFUSE_COLOUR,
    EXTRA_DISPARITY,
    ZERO_PLUS,
)

# SH basis constants (degree <= 3), PlenOctree convention
from thr3ed_atom_tpu.ops.sh import C0 as _C0, C1 as _C1, C2 as _C2, C3 as _C3


class GnomonicStatics(NamedTuple):
    """Hashable statics selecting one compiled gnomonic render program."""

    dims: Tuple[int, int, int]
    aabb: Tuple[Tuple[float, float], Tuple[float, float], Tuple[float, float]]
    axis: int
    flip: bool
    ncoeff: int
    relu_sigma: bool
    with_diffuse: bool
    pos_per_cell: int
    interpret: bool
    # per-u-block early exit: skip all remaining positions of a block once
    # every texel's transmittance is below this (0 disables — the training
    # path keeps 0 so the replay VJP is exact)
    exit_eps: float = 0.0
    # q-block width in texels (0 = whole-Qn stripes). When > 0 the composite
    # grid gains an innermost q-block axis: occupancy skipping and early exit
    # act at [Pb, qb] grain instead of full-height [Pb, Qn] stripes — on
    # white-background scenes a stripe that mixes object and empty sky never
    # exits (T stays 1 on empty texels), so the finer grain is where the
    # converged-scene skip wins live. Must be a multiple of 128 (lane tiles).
    qb: int = 0


def statics_for_grid(
    voxel_grid: VoxelGrid,
    axis: int,
    flip: bool,
    *,
    with_diffuse: bool = False,
    pos_per_cell: int = 0,
    exit_eps: float = 0.0,
    interpret: bool = False,
    qb: int = 0,
) -> GnomonicStatics:
    num_features = voxel_grid.num_features
    assert num_features % 3 == 0, "SH feature count must be 3 * (degree + 1)^2"
    ncoeff = num_features // 3
    assert ncoeff in (1, 4, 9, 16), "gnomonic renderer supports SH degree <= 3"
    post = voxel_grid.density_postactivation
    assert post in ("identity", "relu"), (
        f"gnomonic renderer supports identity/relu density postactivation, got {post}"
    )
    assert voxel_grid.feature_postactivation == "identity"
    dims = voxel_grid.grid_dims
    if pos_per_cell == 0:
        # AUTO: constant world-space quadrature across stage resolutions —
        # target ~256 positions across the grid (32^3 -> 8, 128^3 -> 2,
        # 256^3 -> 1), mirroring the bricked path's auto supersampling
        n_cells = dims[axis] - 1
        pos_per_cell = max(
            1, min(8, 2 ** round(math.log2(max(1.0, 256 / n_cells))))
        )
    assert pos_per_cell in (1, 2, 4, 8), pos_per_cell
    assert qb >= 0 and qb % 128 == 0, "gnomonic qb must be a multiple of 128"
    return GnomonicStatics(
        dims=tuple(dims),
        aabb=tuple((float(lo), float(hi)) for (lo, hi) in voxel_grid.aabb),
        axis=axis,
        flip=bool(flip),
        ncoeff=int(ncoeff),
        relu_sigma=(post == "relu"),
        with_diffuse=bool(with_diffuse),
        pos_per_cell=int(pos_per_cell),
        interpret=bool(interpret),
        exit_eps=float(exit_eps),
        qb=int(qb),
    )


def _num_positions(statics: GnomonicStatics) -> int:
    return (statics.dims[statics.axis] - 1) * statics.pos_per_cell + 1


# ------------------------------------------------------------------ grid repack


def repack_position_slices(voxel_grid: VoxelGrid, statics: GnomonicStatics,
                           round_output: bool = True,
                           vertex_only: bool = False):
    """Differentiable repack into front-to-back position slices
    [NPos, nu, C, nv] bf16 (pre-activated; C = 3*ncoeff + 1 padded to a lane
    multiple). Interior positions (pos_per_cell > 1) are lerps of the two
    neighbouring vertex slices along the march axis, computed in f32 and
    rounded once at the end — the u-resample einsum consumed bf16 anyway, so
    materializing bf16 halves the repack HBM traffic (and the adjoint's) with
    bit-identical t1. Occupancy is computed from these same bf16 values, so
    the exact-zero skip rule stays exactly lossless wrt the pipeline's own
    arithmetic.

    ``vertex_only=True`` (the FUSED v3 pipeline) skips the interior
    interleave and returns the [nvert, nu, C, nv] vertex stack — the fused
    kernels lerp interior positions in VMEM instead (round-5 measurement:
    the interleave chain was ~5 ms of the 8.8 ms repack at 128^3/P=2 and
    doubled every downstream slice read; the transpose itself is ~1.8 ms).

    ``round_output=False`` skips the final bf16 rounding: the multi-pose
    train step hoists ONE repack out of its pose scan and must accumulate the
    k poses' slice cotangents in f32 — keeping the repack's own VJP boundary
    f32 means the hoisted step adds no rounding at all (the consumer casts
    the f32 values to bf16 itself, which is bit-identical to rounding here)."""
    axis = statics.axis
    u_ax, v_ax = _uv_axes(axis)
    P = statics.pos_per_cell
    out_dtype = jnp.bfloat16 if round_output else jnp.float32
    pre_densities, pre_features = voxel_grid.activated_grids()
    unified = jnp.concatenate([pre_features, pre_densities], axis=-1)
    C = _padded_channels(statics)
    unified = jnp.pad(unified, ((0, 0),) * 3 + ((0, C - unified.shape[-1]),))
    # [NP_vertex, nu, C, nv]
    slices = jnp.transpose(unified, (axis, u_ax, 3, v_ax))
    if statics.flip:
        slices = jnp.flip(slices, axis=0)
    if P == 1 or vertex_only:
        return slices.astype(out_dtype)
    mid_fracs = [k / P for k in range(1, P)]
    lo, hi = slices[:-1], slices[1:]
    subs = [lo] + [(1.0 - f) * lo + f * hi for f in mid_fracs]
    inter = jnp.stack(subs, axis=1).reshape((-1,) + slices.shape[1:])
    return jnp.concatenate([inter, slices[-1:]], axis=0).astype(out_dtype)


def _padded_channels(statics: GnomonicStatics) -> int:
    nf = 3 * statics.ncoeff + 1
    return -(-nf // 8) * 8  # 4 -> 8, 13 -> 16, 28 -> 32


# ------------------------------------------------------------------ geometry


def gnomonic_frame(rotation: np.ndarray, height: int, width: int, focal: float,
                   supersample: float, statics: GnomonicStatics):
    """Per-pose static shape info: (Pn, Qn, PB, Pb) texel grid dims + u-axis
    kernel blocking. The float ranges are computed in-jit (dynamic) so one
    program serves every pose of an (axis, flip) variant."""
    del rotation, focal
    Pn_raw, Qn, nv, C = frame_rounding(height, width, supersample, statics)
    if use_fused_composite(statics):
        # FINE u-blocking (round-5): the fused kernel's grid is positions-
        # outermost with a frame-resident state, so PB costs no extra slice
        # DMA — and occupancy gating at Pb = 128 cuts the live fraction ~2x
        # vs whole-stripe blocks at 128^3/400px (probe_composite_cost) while
        # keeping every dot's M dimension a full MXU row tile
        Pb = 128
        PB = -(-Pn_raw // Pb)
        return PB * Pb, Qn, PB, Pb
    PB, Pb, Pn = _p_blocking(Pn_raw, Qn, nv, C, statics.with_diffuse,
                             statics.ncoeff)
    return Pn, Qn, PB, Pb


def frame_rounding(height: int, width: int, supersample: float,
                   statics: GnomonicStatics):
    """Shared texel-grid rounding rules (128-mult u and v) and channel
    padding, used by both the render (_p_blocking) and train
    (gnomonic_train._p_blocking_train) frame planners — one copy so the two
    pipelines can never desynchronize. Returns (Pn_raw, Qn, nv, C).

    Pn rounds to 128 (round-5; was 8) so the fused kernel's fine Pb = 128
    u-blocking divides the frame exactly AND every kernel variant (v2
    stripe, q-split, fused) sees the SAME texel grid — the cross-kernel
    image-identity tests rely on that. Margin texels are occupancy-dead."""
    Pn_raw = -(-int(math.ceil(width * supersample)) // 128) * 128
    Qn = -(-int(math.ceil(height * supersample)) // 128) * 128
    _, v_ax = _uv_axes(statics.axis)
    nv = statics.dims[v_ax]
    C = _padded_channels(statics)
    return Pn_raw, Qn, nv, C


def _corner_ranges(rotation, height, width, focal, statics):
    """Gnomonic (x, y) ranges of the image corners (+1 texel margin), in-jit."""
    axis, u_ax, v_ax = statics.axis, *_uv_axes(statics.axis)
    g = -1.0 if statics.flip else 1.0
    cx = jnp.asarray([0.0, width, 0.0, width], jnp.float32)
    cy = jnp.asarray([0.0, 0.0, height, height], jnp.float32)
    dirs_cam = jnp.stack(
        [(cx - width / 2) / focal, -(cy - height / 2) / focal, -jnp.ones(4)],
        axis=-1,
    )
    d = jnp.matmul(dirs_cam, rotation.T,
                   precision=jax.lax.Precision.HIGHEST)
    x_c = g * d[:, u_ax] / d[:, axis]
    y_c = g * d[:, v_ax] / d[:, axis]
    return (jnp.min(x_c), jnp.max(x_c)), (jnp.min(y_c), jnp.max(y_c))


# ------------------------------------------------------------------ kernel


def _sprows(with_diffuse: bool) -> Tuple[int, int]:
    # state rows: [T, colR, colG, colB, acc, dep, (difR, difG, difB)]
    SROWS = 9 if with_diffuse else 6
    # prev rows: sig, rgbraw x3, (difraw x3,) live — a cell composites only
    # when BOTH endpoint positions are live (outside-AABB samples are dropped,
    # matching the exact renderer's masking; reference process.py:78-85)
    PROWS = 8 if with_diffuse else 5
    return SROWS, PROWS


def _p_blocking(Pn_raw: int, Qn: int, nv: int, C: int, with_diffuse: bool,
                ncoeff: int = 9):
    """Split the u-dimension into PB blocks so the kernel's VMEM working set
    (the [C*Pb, Qn] f32 values + carries + double-buffered t1) stays bounded.
    Returns (PB, Pb, Pn) with Pn = PB * Pb rounded up from Pn_raw."""
    SROWS, PROWS = _sprows(with_diffuse)
    budget = 90 * 1024 * 1024
    PB = 1
    while True:
        Pb = -(-Pn_raw // (8 * PB)) * 8
        est = (
            4 * C * Pb * Qn  # vals
            + 4 * (SROWS * 2 + PROWS) * Pb * Qn  # state + out + prev
            # ybasis block is [ncoeff, Pb, Qn] (16 rows at SH degree 3);
            # max() keeps degree<=2 blocking identical to the measured config
            + 4 * max(9, ncoeff) * Pb * Qn
            + 2 * 2 * C * Pb * nv  # t1 double buffer
        )
        if est <= budget or PB >= 64:
            return PB, Pb, PB * Pb
        PB *= 2


def _qb_blocks(statics: GnomonicStatics, Qn: int) -> Tuple[int, int]:
    """(QB, Qb) for the composite grid's q axis: QB q-blocks of Qb texels.
    statics.qb == 0, an indivisible Qn, or a single block all mean QB == 1
    (the whole-stripe kernel)."""
    qb = statics.qb
    if qb <= 0 or Qn <= qb or Qn % qb != 0:
        return 1, Qn
    return Qn // qb, qb


def gnomonic_occupancy(slices, Ru, statics: GnomonicStatics, PB: int, Pb: int,
                       RvT=None, QB: int = 1):
    """Exact-zero skip flags per (u-block[, q-block], position) —
    (cell_live, pos_needed), both [PB, NP] int32 (QB == 1) or [PB, QB, NP]
    (the q-split kernel).

    A cell's transmittance integral is EXACTLY zero when both endpoint planes
    have no positive density anywhere in the (u, v) range the block's tent
    rows touch (the along-axis interpolant is a lerp of two non-positive
    planes, so relu of it vanishes identically) — the same lossless rule as
    the bricked kernel's occupancy, at (u-block x q-block x position)
    granularity. ``pos_needed[j]`` marks positions adjacent to any live cell
    (their values feed a live trapezoid); everything else skips the
    v-resample matmul."""
    NP = slices.shape[0]
    sig = slices[:, :, 3 * statics.ncoeff, :]  # [NP, nu, nv] pre-relu density
    # u-support of each block: any tent row of the block touching column u
    sup = (Ru > 0).astype(jnp.float32).reshape(NP, PB, Pb, -1).sum(axis=2)
    if QB == 1:
        col_live = (jnp.max(sig, axis=-1) > 0.0).astype(jnp.float32)  # [NP, nu]
        slab_live = (
            jnp.einsum("jbu,ju->jb", sup, col_live,
                       preferred_element_type=jnp.float32) > 0.0
        ).astype(jnp.int32)  # [NP, PB]
    else:
        nv = sig.shape[-1]
        Qb = RvT.shape[-1] // QB
        # v-support of each q-block: any tent column of the block touching v
        sup_v = (RvT > 0).astype(jnp.float32).reshape(NP, nv, QB, Qb).sum(3)
        uq = jnp.einsum(
            "juv,jvq->juq", (sig > 0.0).astype(jnp.float32), sup_v,
            preferred_element_type=jnp.float32,
        )  # [NP, nu, QB]
        slab_live = (
            jnp.einsum("jbu,juq->jbq", sup, uq,
                       preferred_element_type=jnp.float32) > 0.0
        ).astype(jnp.int32)  # [NP, PB, QB]
    prev_l = jnp.concatenate(
        [jnp.zeros((1,) + slab_live.shape[1:], jnp.int32), slab_live[:-1]], 0
    )
    next_l = jnp.concatenate(
        [slab_live[1:], jnp.zeros((1,) + slab_live.shape[1:], jnp.int32)], 0
    )
    cell_live = prev_l | slab_live  # cell j spans positions (j-1, j); j=0 unused
    pos_needed = prev_l | slab_live | next_l
    perm = (1, 0) if QB == 1 else (1, 2, 0)
    return jnp.transpose(cell_live, perm), jnp.transpose(pos_needed, perm)


def _make_composite_kernel(NP, Pb, Qn, nv, C, ncoeff, relu_sigma, with_diffuse,
                           exit_eps):
    """Fused v-resample + SH fold + trapezoid composite; grid=(PB, NP) — the
    position axis is innermost so carries persist in scratch per u-block.
    Occupancy flags skip the matmul for positions with no adjacent live cell
    and the composite for exactly-zero cells; exit_eps > 0 additionally skips
    a block's remaining positions once its max transmittance falls below it."""
    SROWS, PROWS = _sprows(with_diffuse)
    LROW = PROWS - 1

    def kernel(geom_ref, cl_ref, pn_ref, t1_ref, rvt_ref, yb_ref, lu_ref,
               lv_ref, norm_ref, out_ref, prev_ref, state_ref):
        pb = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            state_ref[...] = jnp.zeros_like(state_ref)
            state_ref[0] = jnp.ones((Pb, Qn), jnp.float32)

        work = pn_ref[pb, j] > 0
        if exit_eps > 0.0:
            work = work & (jnp.max(state_ref[0]) > exit_eps)

        @pl.when(work)
        def _():
            vals = jnp.dot(
                t1_ref[0].reshape(C * Pb, nv), rvt_ref[0],
                preferred_element_type=jnp.float32,
            )
            livem = lu_ref[0] * lv_ref[0]  # [Pb, 1] * [1, Qn]
            sig = vals[3 * ncoeff * Pb:(3 * ncoeff + 1) * Pb, :]

            def fold(colour, coeffs):
                acc = yb_ref[0] * vals[
                    (colour * ncoeff) * Pb:(colour * ncoeff + 1) * Pb
                ]
                for k in range(1, coeffs):
                    ch = colour * ncoeff + k
                    acc += yb_ref[k] * vals[ch * Pb:(ch + 1) * Pb]
                return acc

            rgb = [fold(c, ncoeff) for c in range(3)]
            if with_diffuse:
                dif = [fold(c, 1) for c in range(3)]

            @pl.when((j > 0) & (cl_ref[pb, j] > 0))
            def _():
                sig_a = prev_ref[0]
                integ, tbar, _, _ = _relu_trap(sig_a, sig, relu_sigma)
                integ = integ * (prev_ref[LROW] * livem)
                cell_step = geom_ref[j, 1]
                delta = cell_step * norm_ref[...]
                alpha = 1.0 - jnp.exp(-integ * delta)
                T = state_ref[0]
                w = alpha * T
                s_b = geom_ref[j, 0]
                s_mid = (s_b - cell_step + tbar * cell_step) * norm_ref[...]
                tb1 = 1.0 - tbar
                for c in range(3):
                    mraw = tb1 * prev_ref[1 + c] + tbar * rgb[c]
                    state_ref[1 + c] += jax.nn.sigmoid(mraw) * w
                state_ref[4] += w
                state_ref[5] += w * s_mid
                if with_diffuse:
                    for c in range(3):
                        mraw = tb1 * prev_ref[4 + c] + tbar * dif[c]
                        state_ref[6 + c] += jax.nn.sigmoid(mraw) * w
                state_ref[0] = T * (1.0 - alpha)

            prev_ref[0] = sig
            for c in range(3):
                prev_ref[1 + c] = rgb[c]
            if with_diffuse:
                for c in range(3):
                    prev_ref[4 + c] = dif[c]
            prev_ref[LROW] = jnp.broadcast_to(livem, (Pb, Qn))

        @pl.when(j == NP - 1)
        def _():
            out_ref[...] = state_ref[...]

    return kernel, SROWS, PROWS


def _make_composite_kernel_qb(NP, Pb, Qb, nv, C, ncoeff, relu_sigma,
                              with_diffuse, exit_eps):
    """The q-split composite: grid=(PB, NP, QB) with the q-block axis
    innermost. Carries live in [QB, rows, Pb, Qb] scratch indexed by the
    leading (untiled) dim, so occupancy skipping and early exit act per
    [Pb, Qb] block — 4x finer than the whole-stripe kernel at Qn = 512. The
    t1 block's index map is constant in qb, so Pallas fetches it once per
    (pb, j) (no extra HBM traffic for the values)."""
    SROWS, PROWS = _sprows(with_diffuse)
    LROW = PROWS - 1

    def kernel(geom_ref, cl_ref, pn_ref, t1_ref, rvt_ref, yb_ref, lu_ref,
               lv_ref, norm_ref, out_ref, prev_ref, state_ref):
        pb = pl.program_id(0)
        j = pl.program_id(1)
        qb = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            state_ref[qb] = jnp.zeros((SROWS, Pb, Qb), jnp.float32)
            state_ref[qb, 0] = jnp.ones((Pb, Qb), jnp.float32)

        work = pn_ref[pb, qb, j] > 0
        if exit_eps > 0.0:
            work = work & (jnp.max(state_ref[qb, 0]) > exit_eps)

        @pl.when(work)
        def _():
            vals = jnp.dot(
                t1_ref[0].reshape(C * Pb, nv), rvt_ref[0, 0],
                preferred_element_type=jnp.float32,
            )
            livem = lu_ref[0] * lv_ref[0, 0]  # [Pb, 1] * [1, Qb]
            sig = vals[3 * ncoeff * Pb:(3 * ncoeff + 1) * Pb, :]

            def fold(colour, coeffs):
                acc = yb_ref[qb, 0] * vals[
                    (colour * ncoeff) * Pb:(colour * ncoeff + 1) * Pb
                ]
                for k in range(1, coeffs):
                    ch = colour * ncoeff + k
                    acc += yb_ref[qb, k] * vals[ch * Pb:(ch + 1) * Pb]
                return acc

            rgb = [fold(c, ncoeff) for c in range(3)]
            if with_diffuse:
                dif = [fold(c, 1) for c in range(3)]

            @pl.when((j > 0) & (cl_ref[pb, qb, j] > 0))
            def _():
                sig_a = prev_ref[qb, 0]
                integ, tbar, _, _ = _relu_trap(sig_a, sig, relu_sigma)
                integ = integ * (prev_ref[qb, LROW] * livem)
                cell_step = geom_ref[j, 1]
                delta = cell_step * norm_ref[qb]
                alpha = 1.0 - jnp.exp(-integ * delta)
                T = state_ref[qb, 0]
                w = alpha * T
                s_b = geom_ref[j, 0]
                s_mid = (s_b - cell_step + tbar * cell_step) * norm_ref[qb]
                tb1 = 1.0 - tbar
                for c in range(3):
                    mraw = tb1 * prev_ref[qb, 1 + c] + tbar * rgb[c]
                    state_ref[qb, 1 + c] += jax.nn.sigmoid(mraw) * w
                state_ref[qb, 4] += w
                state_ref[qb, 5] += w * s_mid
                if with_diffuse:
                    for c in range(3):
                        mraw = tb1 * prev_ref[qb, 4 + c] + tbar * dif[c]
                        state_ref[qb, 6 + c] += jax.nn.sigmoid(mraw) * w
                state_ref[qb, 0] = T * (1.0 - alpha)

            prev_ref[qb, 0] = sig
            for c in range(3):
                prev_ref[qb, 1 + c] = rgb[c]
            if with_diffuse:
                for c in range(3):
                    prev_ref[qb, 4 + c] = dif[c]
            prev_ref[qb, LROW] = jnp.broadcast_to(livem, (Pb, Qb))

        @pl.when(j == NP - 1)
        def _():
            out_ref[qb] = state_ref[qb]

    return kernel, SROWS, PROWS


def _composite_positions_qb(t1, rvt, ybasis, live_u, live_v, norm, geom,
                            statics, Pn, Qn, PB, Pb, QB, Qb, cell_live,
                            pos_needed):
    """q-split variant of composite_positions. Q-wide operands are reshaped
    to carry a leading q-block axis so every in-kernel access is a leading-dim
    (untiled) index — no dynamic lane slicing anywhere."""
    NP = t1.shape[0]
    nv = t1.shape[3]
    C = _padded_channels(statics)
    kernel, SROWS, PROWS = _make_composite_kernel_qb(
        NP, Pb, Qb, nv, C, statics.ncoeff, statics.relu_sigma,
        statics.with_diffuse, statics.exit_eps,
    )
    rvt_q = jnp.transpose(rvt.reshape(NP, nv, QB, Qb), (0, 2, 1, 3))
    yb_q = jnp.transpose(
        ybasis.reshape(statics.ncoeff, Pn, QB, Qb), (2, 0, 1, 3)
    )
    lv_q = live_v.reshape(NP, QB, 1, Qb)
    norm_q = jnp.transpose(norm.reshape(Pn, QB, Qb), (1, 0, 2))
    out = pl.pallas_call(
        kernel,
        grid=(PB, NP, QB),
        in_specs=[
            pl.BlockSpec((NP, 8), lambda pb, t, qb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((PB, QB, NP), lambda pb, t, qb: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((PB, QB, NP), lambda pb, t, qb: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, Pb, nv), lambda pb, t, qb: (t, 0, pb, 0)),
            pl.BlockSpec((1, 1, nv, Qb), lambda pb, t, qb: (t, qb, 0, 0)),
            pl.BlockSpec((QB, statics.ncoeff, Pb, Qb),
                         lambda pb, t, qb: (0, 0, pb, 0)),
            pl.BlockSpec((1, Pb, 1), lambda pb, t, qb: (t, pb, 0)),
            pl.BlockSpec((1, 1, 1, Qb), lambda pb, t, qb: (t, qb, 0, 0)),
            pl.BlockSpec((QB, Pb, Qb), lambda pb, t, qb: (0, pb, 0)),
        ],
        out_specs=pl.BlockSpec((QB, SROWS, Pb, Qb),
                               lambda pb, t, qb: (0, 0, pb, 0)),
        out_shape=jax.ShapeDtypeStruct((QB, SROWS, Pn, Qb), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((QB, PROWS, Pb, Qb), jnp.float32),
            pltpu.VMEM((QB, SROWS, Pb, Qb), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=statics.interpret,
    )(geom, cell_live, pos_needed, t1, rvt_q, yb_q, live_u, lv_q, norm_q)
    return jnp.transpose(out, (1, 2, 0, 3)).reshape(SROWS, Pn, Qn)


def composite_positions(t1, rvt, ybasis, live_u, live_v, norm, geom, statics,
                        Pn, Qn, PB, Pb, occupancy=None):
    """Run the fused composite kernel over the position stack.

    t1 [NP, C, Pn, nv] bf16, rvt [NP, nv, Qn] bf16, ybasis [ncoeff, Pn, Qn]
    f32, live_u [NP, Pn, 1] f32, live_v [NP, 1, Qn] f32, norm [Pn, Qn] f32,
    geom [NP, 8] f32 (s_j, cell_step), occupancy = optional
    (cell_live, pos_needed) i32 pair from gnomonic_occupancy — [PB, NP] for
    the whole-stripe kernel, [PB, QB, NP] when statics.qb > 0 (pass
    RvT=geo.RvT, QB=QB to gnomonic_occupancy); None = everything live.
    Returns [SROWS, Pn, Qn] f32 composited state: rows
    (T, colour rgb, acc, depth[, diffuse rgb])."""
    NP = t1.shape[0]
    nv = t1.shape[3]
    C = _padded_channels(statics)
    QB, Qb = _qb_blocks(statics, Qn)
    if occupancy is None:
        shape = (PB, NP) if QB == 1 else (PB, QB, NP)
        cell_live = jnp.ones(shape, jnp.int32)
        pos_needed = jnp.ones(shape, jnp.int32)
    else:
        cell_live, pos_needed = occupancy
    if QB > 1:
        assert cell_live.shape == (PB, QB, NP), (
            "q-split composite needs [PB, QB, NP] occupancy flags "
            "(gnomonic_occupancy(..., RvT=geo.RvT, QB=QB))"
        )
        return _composite_positions_qb(
            t1, rvt, ybasis, live_u, live_v, norm, geom, statics, Pn, Qn,
            PB, Pb, QB, Qb, cell_live, pos_needed,
        )
    kernel, SROWS, PROWS = _make_composite_kernel(
        NP, Pb, Qn, nv, C, statics.ncoeff, statics.relu_sigma,
        statics.with_diffuse, statics.exit_eps,
    )
    return pl.pallas_call(
        kernel,
        grid=(PB, NP),
        in_specs=[
            pl.BlockSpec((NP, 8), lambda pb, t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((PB, NP), lambda pb, t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((PB, NP), lambda pb, t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, C, Pb, nv), lambda pb, t: (t, 0, pb, 0)),
            pl.BlockSpec((1, nv, Qn), lambda pb, t: (t, 0, 0)),
            pl.BlockSpec((statics.ncoeff, Pb, Qn), lambda pb, t: (0, pb, 0)),
            pl.BlockSpec((1, Pb, 1), lambda pb, t: (t, pb, 0)),
            pl.BlockSpec((1, 1, Qn), lambda pb, t: (t, 0, 0)),
            pl.BlockSpec((Pb, Qn), lambda pb, t: (pb, 0)),
        ],
        out_specs=pl.BlockSpec((SROWS, Pb, Qn), lambda pb, t: (0, pb, 0)),
        out_shape=jax.ShapeDtypeStruct((SROWS, Pn, Qn), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((PROWS, Pb, Qn), jnp.float32),
            pltpu.VMEM((SROWS, Pb, Qn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=statics.interpret,
    )(geom, cell_live, pos_needed, t1, rvt, ybasis, live_u, live_v, norm)


# ------------------------------------------------- fused (v3) composite kernel


def gnomonic_occupancy_lite(slices, geom, statics: GnomonicStatics, Pn: int,
                            Qn: int, PB: int, Pb: int, QB: int, Qb: int):
    """Exact-zero skip flags from the affine geom scalars (no Ru/RvT tensors).

    Interval form of gnomonic_occupancy: a (u-block, q-block, position) is
    live iff any density > 0 exists inside the rectangle of grid columns the
    block's tent taps can touch — u in [min U - 1, max U + 1] over the block's
    p-range (U = bu + ku*p), v likewise over the q-range. Closed-interval
    bounds are a (boundary-tie) superset of the tent-support rule, so
    skipping stays exactly lossless. Returns (cell_live, pos_needed,
    pos_any): [PB, QB, NP], [PB, QB, NP], [PB, NP] int32.

    ``slices`` is the VERTEX stack [nvert, nu, C, nv] (the fused kernels lerp
    interior positions in VMEM). An interior position's density sign is
    bounded by the union of its two endpoint planes (a positive lerp needs a
    positive endpoint), so the union keeps the skip rule lossless."""
    NP = _num_positions(statics)
    nu, nv = slices.shape[1], slices.shape[3]
    P = statics.pos_per_cell
    sigv = slices[:, :, 3 * statics.ncoeff, :]  # [nvert, nu, nv] pre-relu
    sigv_pos = (sigv > 0.0).astype(jnp.float32)
    if P == 1:
        sig_pos = sigv_pos
    else:
        idx = np.arange(NP)
        ia = jnp.asarray(idx // P)
        ib = jnp.asarray(np.minimum(idx // P + 1, slices.shape[0] - 1))
        interior = jnp.asarray((idx % P) > 0, jnp.float32)[:, None, None]
        sig_pos = jnp.maximum(sigv_pos[ia], interior * sigv_pos[ib])
    bu, ku = geom[:, 2], geom[:, 3]
    bv, kv = geom[:, 4], geom[:, 5]

    def interval_mask(b, k, n_blocks, blk, n_idx):
        # [NP, n_blocks, n_idx] mask of indices within the blocks' tent reach
        p0 = jnp.arange(n_blocks, dtype=jnp.float32) * blk
        p1 = p0 + (blk - 1)
        e0 = b[:, None] + k[:, None] * p0[None, :]
        e1 = b[:, None] + k[:, None] * p1[None, :]
        lo = jnp.minimum(e0, e1) - 1.0
        hi = jnp.maximum(e0, e1) + 1.0
        idx = jnp.arange(n_idx, dtype=jnp.float32)
        return (
            (idx[None, None, :] >= lo[..., None])
            & (idx[None, None, :] <= hi[..., None])
        ).astype(jnp.float32)

    umask = interval_mask(bu, ku, PB, Pb, nu)  # [NP, PB, nu]
    vmask = interval_mask(bv, kv, QB, Qb, nv)  # [NP, QB, nv]
    uq = jnp.einsum("juv,jqv->juq", sig_pos, vmask,
                    preferred_element_type=jnp.float32)
    slab_live = (
        jnp.einsum("jbu,juq->jbq", umask, uq,
                   preferred_element_type=jnp.float32) > 0.0
    ).astype(jnp.int32)  # [NP, PB, QB]
    prev_l = jnp.concatenate(
        [jnp.zeros((1, PB, QB), jnp.int32), slab_live[:-1]], 0
    )
    next_l = jnp.concatenate(
        [slab_live[1:], jnp.zeros((1, PB, QB), jnp.int32)], 0
    )
    cell_live = jnp.transpose(prev_l | slab_live, (1, 2, 0))
    pos_needed = jnp.transpose(prev_l | slab_live | next_l, (1, 2, 0))
    pos_any = (jnp.sum(pos_needed, axis=1) > 0).astype(jnp.int32)  # [PB, NP]
    return cell_live, pos_needed, pos_any


def _mix_vertex_slices(sl_a_ref, sl_b_ref, j, P):
    """In-VMEM interior-position lerp of the two neighbouring VERTEX slice
    blocks (round-5: the repack no longer materializes interior positions —
    that interleave was ~5 ms/step of pure data movement at 128^3/P=2 and
    doubled every slice read; a [nu, C*nv] VPU lerp per position is free)."""
    if P == 1:
        return sl_a_ref[0]
    f = (j % P).astype(jnp.float32) * (1.0 / P)
    mixed = (1.0 - f) * sl_a_ref[0].astype(jnp.float32) \
        + f * sl_b_ref[0].astype(jnp.float32)
    return mixed.astype(jnp.bfloat16)


def _vertex_index_maps(P, nvert):
    """Block index maps for the two vertex-slice inputs of the fused kernels:
    position j reads vertices j//P and min(j//P + 1, nvert-1)."""

    def ia(t):
        return jnp.minimum(t // P, nvert - 1)

    def ib(t):
        return jnp.minimum(t // P + 1, nvert - 1)

    return ia, ib


def _make_composite_kernel_fused(NP, Pb, Qb, QB, PB, nu, nv, C, ncoeff,
                                 relu_sigma, with_diffuse, exit_eps, P,
                                 frame_inline=None):
    """v3: the u-resample matmul moves INSIDE the composite kernel.

    grid=(NP, PB, QB) — positions OUTERMOST (round-5 restructure, mirroring
    the train backward): each vertex-slice block streams from HBM once per
    position regardless of PB, and the march state + previous-position rows
    live in frame-resident [PB, QB, rows, Pb, Qb] buffers. That makes FINE
    u-blocking free, and fine blocking is the occupancy lever: at 128^3/400px
    the live fraction drops from 73%/32% (pos_any/pos_needed at PB=1) to
    26%/9% at Pb=64, nearly 3x less gated compute (probe_composite_cost).

    At qb == 0 of a needed (position, u-block), the kernel lerps the
    position's slice from its two VERTEX slice blocks (interior quadrature
    positions are along-axis lerps — computed here instead of materialized by
    the repack), builds the u-tent block [Pb, nu] from the affine geom
    scalars (U = bu + ku*p), runs ONE [Pb, nu] @ [nu, C*nv] MXU pass, and
    stores the raw [Pb, C*nv] result in t1m scratch. Each qb step then builds
    its v-tents [nv, Qb] in-kernel and v-resamples per USED channel with
    vreg-column-aligned [Pb, nv] @ [nv, Qb] dots (the pad channels and the
    former 32-block lane->sublane scatter are gone — round-5). Wins vs v2:
    the [NP, C, Pn, nv] t1 tensor never exists in HBM (~1 GB/pose round trip
    at 128^3 / 400px), the u-resample work is occupancy-skipped per
    (position, u-block), and the Ru/RvT/live geometry tensors (~130 MB of
    XLA build+write+read per pose) reduce to 4 scalars per position.

    ``frame_inline`` = (u_ax, v_ax, axis, g) switches the SH basis + norm
    operands from HBM inputs to an in-kernel build (round-5): at j == 0 each
    (pb, qb) block computes its texel directions from 4 frame scalars (x0,
    dx, y0, dy in SMEM) and evaluates the SH ladder into VMEM scratch —
    deleting the XLA-side [ncoeff, Pn, Qn] build + transpose + fetch that
    measured as most of the render's 0.61 ms/pose geometry stage. The
    training path keeps the materialized operands (its backward folds
    cotangents against the same ybasis)."""
    SROWS, PROWS = _sprows(with_diffuse)
    LROW = PROWS - 1

    def kernel(*refs):
        if frame_inline is None:
            (geom_ref, cl_ref, pn_ref, pa_ref, sl_a_ref, sl_b_ref, yb_ref,
             norm_ref, out_ref, prev_ref, t1m_ref) = refs
            yb_at = lambda pb, qb, k: yb_ref[pb, qb, k]  # noqa: E731
            nm_at = lambda pb, qb: norm_ref[pb, qb]  # noqa: E731
        else:
            (geom_ref, cl_ref, pn_ref, pa_ref, sl_a_ref, sl_b_ref, fs_ref,
             out_ref, prev_ref, t1m_ref, yb_scr, nm_scr) = refs
            yb_at = lambda pb, qb, k: yb_scr[pb, qb, k]  # noqa: E731
            nm_at = lambda pb, qb: nm_scr[pb, qb]  # noqa: E731
        j = pl.program_id(0)
        pb = pl.program_id(1)
        qb = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            out_ref[pb, qb] = jnp.zeros((SROWS, Pb, Qb), jnp.float32)
            out_ref[pb, qb, 0] = jnp.ones((Pb, Qb), jnp.float32)
            if frame_inline is not None:
                u_ax, v_ax, axis, g = frame_inline
                iu = jax.lax.broadcasted_iota(jnp.int32, (Pb, Qb), 0)
                iv = jax.lax.broadcasted_iota(jnp.int32, (Pb, Qb), 1)
                xs = fs_ref[0] + (iu + pb * Pb).astype(jnp.float32) * fs_ref[1]
                ys = fs_ref[2] + (iv + qb * Qb).astype(jnp.float32) * fs_ref[3]
                nm = jnp.sqrt(1.0 + xs * xs + ys * ys)
                nm_scr[pb, qb] = nm
                comp = [None, None, None]
                comp[u_ax] = xs / nm
                comp[v_ax] = ys / nm
                comp[axis] = g / nm
                yb_scr[pb, qb] = _ybasis_rows(
                    comp[0], comp[1], comp[2], ncoeff, Pb, Qb
                )

        s_j = geom_ref[j, 0]
        bu = geom_ref[j, 2]
        ku = geom_ref[j, 3]
        bv = geom_ref[j, 4]
        kv = geom_ref[j, 5]

        # ---- u-resample this position's slice once (at the first q-block).
        # NOT exit-gated (round-5 negative result, chip-measured): gating
        # this dot on the stripe's transmittance makes position j+1's t1m
        # build data-depend on position j's state writes, serializing what
        # Mosaic otherwise overlaps — 45.6 -> 43.5M rays/s nested inside the
        # when (and 39.5M with the check hoisted to every grid step). The
        # occupancy gate (pa) has no such dependency and stays.
        def _u_resample_body():
            sl = _mix_vertex_slices(sl_a_ref, sl_b_ref, j, P)
            p_io = jax.lax.broadcasted_iota(jnp.int32, (Pb, nu), 0)
            u_io = jax.lax.broadcasted_iota(jnp.int32, (Pb, nu), 1)
            U = bu + ku * (p_io + pb * Pb).astype(jnp.float32)
            w_u = jnp.maximum(0.0, 1.0 - jnp.abs(U - u_io.astype(jnp.float32)))
            # store the raw [Pb, C*nv] result — the v-step slices per-channel
            # vreg-column-aligned blocks out of it, so the former 32
            # lane->sublane scatter copies (12 MB of VMEM moves per position)
            # are gone entirely
            t1m_ref[...] = jnp.dot(
                w_u.astype(jnp.bfloat16), sl,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)  # [Pb, C*nv]

        pl.when((qb == 0) & (pa_ref[pb, j] > 0) & (_KPROF != "nou"))(
            _u_resample_body
        )

        work = pn_ref[pb, qb, j] > 0
        if exit_eps > 0.0:
            work = work & (jnp.max(out_ref[pb, qb, 0]) > exit_eps)

        @pl.when(work)
        def _():
            # v-tents + texel liveness for this q-block, from the affine
            q_io = jax.lax.broadcasted_iota(jnp.int32, (nv, Qb), 1)
            v_io = jax.lax.broadcasted_iota(jnp.int32, (nv, Qb), 0)
            V = bv + kv * (q_io + qb * Qb).astype(jnp.float32)
            w_v = jnp.maximum(0.0, 1.0 - jnp.abs(V - v_io.astype(jnp.float32)))
            w_vb = w_v.astype(jnp.bfloat16)
            ch_cache = {}

            def ch_val(c):
                # per-channel v-resample [Pb, nv] @ [nv, Qb]; the 128-lane
                # slices are whole vreg columns (no relayout), and the C - 28
                # pad channels are never dotted at all
                if c not in ch_cache:
                    ch_cache[c] = jnp.dot(
                        t1m_ref[:, c * nv:(c + 1) * nv], w_vb,
                        preferred_element_type=jnp.float32,
                    )
                return ch_cache[c]

            pq_p = jax.lax.broadcasted_iota(jnp.int32, (Pb, Qb), 0)
            pq_q = jax.lax.broadcasted_iota(jnp.int32, (Pb, Qb), 1)
            Up = bu + ku * (pq_p + pb * Pb).astype(jnp.float32)
            Vq = bv + kv * (pq_q + qb * Qb).astype(jnp.float32)
            livem = (
                (Up >= -0.5) & (Up <= nu - 0.5) & (s_j > 0.0)
                & (Vq >= -0.5) & (Vq <= nv - 0.5)
            ).astype(jnp.float32)
            sig = ch_val(3 * ncoeff)

            def fold(colour, coeffs):
                acc = yb_at(pb, qb, 0) * ch_val(colour * ncoeff)
                for k in range(1, coeffs):
                    acc += yb_at(pb, qb, k) * ch_val(colour * ncoeff + k)
                return acc

            if _KPROF == "nofold":
                rgb = [sig, sig, sig]
            else:
                rgb = [fold(c, ncoeff) for c in range(3)]
            if with_diffuse:
                dif = [fold(c, 1) for c in range(3)]

            @pl.when((j > 0) & (cl_ref[pb, qb, j] > 0))
            def _():
                sig_a = prev_ref[pb, qb, 0]
                integ, tbar, _, _ = _relu_trap(sig_a, sig, relu_sigma)
                integ = integ * (prev_ref[pb, qb, LROW] * livem)
                cell_step = geom_ref[j, 1]
                delta = cell_step * nm_at(pb, qb)
                if _KPROF == "notrans":
                    alpha = jnp.clip(integ * delta, 0.0, 1.0)
                    tone = lambda x: x * 0.25 + 0.5  # noqa: E731
                else:
                    alpha = 1.0 - jnp.exp(-integ * delta)
                    tone = jax.nn.sigmoid
                T = out_ref[pb, qb, 0]
                w = alpha * T
                s_b = geom_ref[j, 0]
                s_mid = (s_b - cell_step + tbar * cell_step) * nm_at(pb, qb)
                tb1 = 1.0 - tbar
                for c in range(3):
                    mraw = tb1 * prev_ref[pb, qb, 1 + c] + tbar * rgb[c]
                    out_ref[pb, qb, 1 + c] += tone(mraw) * w
                out_ref[pb, qb, 4] += w
                out_ref[pb, qb, 5] += w * s_mid
                if with_diffuse:
                    for c in range(3):
                        mraw = tb1 * prev_ref[pb, qb, 4 + c] + tbar * dif[c]
                        out_ref[pb, qb, 6 + c] += tone(mraw) * w
                out_ref[pb, qb, 0] = T * (1.0 - alpha)

            prev_ref[pb, qb, 0] = sig
            for c in range(3):
                prev_ref[pb, qb, 1 + c] = rgb[c]
            if with_diffuse:
                for c in range(3):
                    prev_ref[pb, qb, 4 + c] = dif[c]
            prev_ref[pb, qb, LROW] = livem

    return kernel, SROWS, PROWS


def composite_positions_fused(slices, ybasis, norm, geom, statics, Pn, Qn,
                              PB, Pb, occupancy, xr=None, yr=None):
    """Run the FUSED (v3) composite kernel: raw VERTEX slices in, composited
    state out — no t1 intermediate, no interior-position materialization.
    slices [nvert, nu, C, nv] bf16 (consumed as the free [nvert, nu, C*nv]
    view; interior quadrature positions are lerped in VMEM), occupancy =
    (cell_live [PB, QB, NP], pos_needed [PB, QB, NP], pos_any [PB, NP]) from
    gnomonic_occupancy_lite. Requires statics.qb > 0 (the q-split grid)."""
    nvert, nu = slices.shape[0], slices.shape[1]
    nv = slices.shape[3]
    NP = _num_positions(statics)
    P = statics.pos_per_cell
    C = _padded_channels(statics)
    QB, Qb = _qb_blocks(statics, Qn)
    cell_live, pos_needed, pos_any = occupancy
    inline = xr is not None
    frame_inline = None
    if inline:
        u_ax, v_ax = _uv_axes(statics.axis)
        frame_inline = (u_ax, v_ax, statics.axis,
                        -1.0 if statics.flip else 1.0)
    kernel, SROWS, PROWS = _make_composite_kernel_fused(
        NP, Pb, Qb, QB, PB, nu, nv, C, statics.ncoeff, statics.relu_sigma,
        statics.with_diffuse, statics.exit_eps, P, frame_inline=frame_inline,
    )
    ia, ib = _vertex_index_maps(P, nvert)
    slices2d = slices.reshape(nvert, nu, C * nv)
    in_specs = [
        pl.BlockSpec((NP, 8), lambda t, pb, qb: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((PB, QB, NP), lambda t, pb, qb: (0, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((PB, QB, NP), lambda t, pb, qb: (0, 0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((PB, NP), lambda t, pb, qb: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, nu, C * nv), lambda t, pb, qb: (ia(t), 0, 0)),
        pl.BlockSpec((1, nu, C * nv), lambda t, pb, qb: (ib(t), 0, 0)),
    ]
    scratch = [
        pltpu.VMEM((PB, QB, PROWS, Pb, Qb), jnp.float32),
        pltpu.VMEM((Pb, C * nv), jnp.bfloat16),
    ]
    if inline:
        # 4 frame scalars replace the [ncoeff, Pn, Qn] ybasis + [Pn, Qn]
        # norm HBM operands; the kernel rebuilds both into VMEM scratch at
        # j == 0 (see _make_composite_kernel_fused)
        (x0, x1), (y0, y1) = xr, yr
        fs = jnp.stack([
            x0, (x1 - x0) / (Pn - 1), y0, (y1 - y0) / (Qn - 1),
            jnp.zeros_like(x0), jnp.zeros_like(x0), jnp.zeros_like(x0),
            jnp.zeros_like(x0),
        ]).astype(jnp.float32)
        in_specs.append(pl.BlockSpec((8,), lambda t, pb, qb: (0,),
                                     memory_space=pltpu.SMEM))
        scratch += [
            pltpu.VMEM((PB, QB, statics.ncoeff, Pb, Qb), jnp.float32),
            pltpu.VMEM((PB, QB, Pb, Qb), jnp.float32),
        ]
        operands = (geom, cell_live, pos_needed, pos_any, slices2d, slices2d,
                    fs)
    else:
        # frame-wide operands reorganize to [PB, QB, ..., Pb, Qb] and stay
        # VMEM-resident (constant index maps, fetched once) — with positions
        # outermost they would otherwise refetch on every (j, pb) step
        yb_pq = jnp.transpose(
            ybasis.reshape(statics.ncoeff, PB, Pb, QB, Qb), (1, 3, 0, 2, 4)
        )
        norm_pq = jnp.transpose(norm.reshape(PB, Pb, QB, Qb), (0, 2, 1, 3))
        in_specs += [
            pl.BlockSpec((PB, QB, statics.ncoeff, Pb, Qb),
                         lambda t, pb, qb: (0, 0, 0, 0, 0)),
            pl.BlockSpec((PB, QB, Pb, Qb), lambda t, pb, qb: (0, 0, 0, 0)),
        ]
        operands = (geom, cell_live, pos_needed, pos_any, slices2d, slices2d,
                    yb_pq, norm_pq)
    out = pl.pallas_call(
        kernel,
        grid=(NP, PB, QB),
        in_specs=in_specs,
        # the march state IS the output block: one frame-resident
        # [PB, QB, SROWS, Pb, Qb] buffer (constant index map -> single final
        # flush), initialized at j == 0 and updated in place
        out_specs=pl.BlockSpec((PB, QB, SROWS, Pb, Qb),
                               lambda t, pb, qb: (0, 0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((PB, QB, SROWS, Pb, Qb), jnp.float32),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=statics.interpret,
    )(*operands)
    return jnp.transpose(out, (2, 0, 3, 1, 4)).reshape(SROWS, Pn, Qn)


# ------------------------------------------------------------------ pipeline


def _ybasis_rows(x_, y_, z_, ncoeff, Pn, Qn):
    """SH basis values of the texel directions, stacked [ncoeff, Pn, Qn]."""
    rows = [_C0 * jnp.ones((Pn, Qn), jnp.float32)]
    if ncoeff > 1:
        rows += [-_C1 * y_, _C1 * z_, -_C1 * x_]
    if ncoeff > 4:
        rows += [
            _C2[0] * x_ * y_,
            _C2[1] * y_ * z_,
            _C2[2] * (2.0 * z_ * z_ - x_ * x_ - y_ * y_),
            _C2[3] * x_ * z_,
            _C2[4] * (x_ * x_ - y_ * y_),
        ]
    if ncoeff > 9:
        xx, yy, zz = x_ * x_, y_ * y_, z_ * z_
        rows += [
            _C3[0] * y_ * (3.0 * xx - yy),
            _C3[1] * x_ * y_ * z_,
            _C3[2] * y_ * (4.0 * zz - xx - yy),
            _C3[3] * z_ * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            _C3[4] * x_ * (4.0 * zz - xx - yy),
            _C3[5] * z_ * (xx - yy),
            _C3[6] * x_ * (xx - 3.0 * yy),
        ]
    return jnp.stack(rows, axis=0)


class GnomonicGeometry(NamedTuple):
    """Per-pose, grid-independent resample/composite operands (all constants
    wrt the grid parameters — the training path stops gradients through it)."""

    Ru: jnp.ndarray  # [NP, Pn, nu] bf16 u-axis tent weights
    RvT: jnp.ndarray  # [NP, nv, Qn] bf16 v-axis tent weights (transposed)
    ybasis: jnp.ndarray  # [ncoeff, Pn, Qn] f32
    live_u: jnp.ndarray  # [NP, Pn, 1] f32
    live_v: jnp.ndarray  # [NP, 1, Qn] f32
    norm: jnp.ndarray  # [Pn, Qn] f32
    geom: jnp.ndarray  # [NP, 8] f32 (s_j, cell_step)
    xr: Tuple[jnp.ndarray, jnp.ndarray]
    yr: Tuple[jnp.ndarray, jnp.ndarray]


def gnomonic_geometry(
    rotation, origin, statics: GnomonicStatics, height: int, width: int,
    focal, supersample: float, frame: Optional[Tuple[int, int]] = None,
    phase: Optional[Tuple] = None, lite: bool = False,
    skip_basis: bool = False,
) -> GnomonicGeometry:
    """All pose-dependent operands of the gnomonic march (in-jit, dynamic).
    ``frame`` overrides (Pn, Qn) — the training pipeline uses backward-sized
    blocking (gnomonic_train.gnomonic_frame_train). ``phase`` (two scalars in
    [-0.5, 0.5], texel units) shifts the whole texel frame sub-texel — the
    warp compensates exactly, so a keyed per-step phase turns the fixed
    resample grid into an unbiased stochastic quadrature over texel phase
    (the gnomonic analogue of perturb_sampled_points)."""
    axis = statics.axis
    u_ax, v_ax = _uv_axes(axis)
    g = -1.0 if statics.flip else 1.0
    P = statics.pos_per_cell
    aabb, dims = statics.aabb, statics.dims
    NP = _num_positions(statics)
    nu = dims[u_ax]
    nv = dims[v_ax]
    if frame is not None:
        Pn, Qn = frame
    else:
        Pn, Qn, _PB, _Pb = gnomonic_frame(
            None, height, width, focal, supersample, statics
        )
    lo_a, hi_a = aabb[axis]
    cell_a = (hi_a - lo_a) / dims[axis]
    su = dims[u_ax] / (aabb[u_ax][1] - aabb[u_ax][0])
    sv = dims[v_ax] / (aabb[v_ax][1] - aabb[v_ax][0])

    (x0, x1), (y0, y1) = _corner_ranges(rotation, height, width, focal, statics)
    mx = (x1 - x0) / Pn
    my = (y1 - y0) / Qn
    x0, x1 = x0 - mx, x1 + mx
    y0, y1 = y0 - my, y1 + my
    if phase is not None:
        dxt = mx * phase[0]
        dyt = my * phase[1]
        x0, x1 = x0 + dxt, x1 + dxt
        y0, y1 = y0 + dyt, y1 + dyt

    xs = x0 + (x1 - x0) * jnp.arange(Pn, dtype=jnp.float32) / (Pn - 1)
    ys = y0 + (y1 - y0) * jnp.arange(Qn, dtype=jnp.float32) / (Qn - 1)
    if skip_basis:
        # the fused render kernel rebuilds ybasis + norm in VMEM from the
        # frame scalars (composite_positions_fused xr/yr) — skip the
        # [ncoeff, Pn, Qn] XLA materialization entirely
        norm = ybasis = None
    else:
        norm = jnp.sqrt(1.0 + xs[:, None] ** 2 + ys[None, :] ** 2)

        comp = [None, None, None]
        comp[u_ax] = xs[:, None] / norm
        comp[v_ax] = jnp.broadcast_to(ys[None, :], (Pn, Qn)) / norm
        comp[axis] = g / norm
        ybasis = _ybasis_rows(
            comp[0], comp[1], comp[2], statics.ncoeff, Pn, Qn
        )

    j = jnp.arange(NP, dtype=jnp.float32)
    c_j = (NP - 1 - j) / P if statics.flip else j / P
    w_j = lo_a + (c_j + 0.5) * cell_a
    s_j = (w_j - origin[axis]) / g

    a_u = (origin[u_ax] - aabb[u_ax][0]) * su - 0.5
    a_v = (origin[v_ax] - aabb[v_ax][0]) * sv - 0.5
    if lite:
        # the fused composite kernel rebuilds tents/liveness in-kernel from
        # the affine geom scalars; skip the [NP, Pn, nu] tensor builds
        Ru = RvT = live_u = live_v = None
    else:
        U = a_u + (s_j[:, None] * su) * xs[None, :]  # [NP, Pn]
        V = a_v + (s_j[:, None] * sv) * ys[None, :]  # [NP, Qn]

        def tent(pos, n):
            idx = jnp.arange(n, dtype=jnp.float32)
            return jnp.maximum(0.0, 1.0 - jnp.abs(pos[..., None] - idx))

        Ru = tent(U, nu).astype(jnp.bfloat16)  # [NP, Pn, nu]
        RvT = jnp.swapaxes(tent(V, nv), 1, 2).astype(jnp.bfloat16)
        live_u = (
            (U >= -0.5) & (U <= nu - 0.5) & (s_j[:, None] > 0.0)
        ).astype(jnp.float32)[..., None]
        live_v = ((V >= -0.5) & (V <= nv - 0.5)).astype(jnp.float32)[:, None, :]

    cell_step = jnp.full((NP,), cell_a / P, jnp.float32)
    # affine texel->grid coefficients per position (U = bu + ku*p,
    # V = bv + kv*q): the FUSED composite kernel rebuilds the tent weights
    # from these four scalars instead of reading precomputed Ru/RvT tensors
    bu = a_u + (s_j * su) * x0
    ku = (s_j * su) * ((x1 - x0) / (Pn - 1))
    bv = a_v + (s_j * sv) * y0
    kv = (s_j * sv) * ((y1 - y0) / (Qn - 1))
    geom = jnp.stack(
        [s_j, cell_step, bu, ku, bv, kv] + [jnp.zeros_like(s_j)] * 2, axis=-1
    )  # [NP, 8]
    return GnomonicGeometry(
        Ru=Ru, RvT=RvT, ybasis=ybasis, live_u=live_u, live_v=live_v,
        norm=norm, geom=geom, xr=(x0, x1), yr=(y0, y1),
    )


def resample_u(slices, Ru):
    """u-resample, batched over positions (XLA/MXU): [NP, C, Pn, nv] bf16."""
    return jnp.einsum(
        "jpu,jucv->jcpv",
        Ru,
        slices.astype(jnp.bfloat16),
        preferred_element_type=jnp.bfloat16,
    )


def _use_fused_composite(statics: GnomonicStatics, nv: int) -> bool:
    """The fused (v3) kernel's t1v lane slices need nv to be a lane-tile
    multiple; interpret mode has no such constraint. Production grids
    (128^3+) qualify; small coarse stages fall back to the v2 path."""
    return statics.qb > 0 and (nv % 128 == 0 or statics.interpret)


def use_fused_composite(statics: GnomonicStatics) -> bool:
    """Caller-side fused-path predicate (statics only — nv is the grid's
    v-axis extent). Callers MUST repack with ``vertex_only=`` this value:
    the fused kernels consume the vertex stack, the v2 path the full
    interleaved position stack."""
    _, v_ax = _uv_axes(statics.axis)
    return _use_fused_composite(statics, statics.dims[v_ax])


@partial(jax.jit, static_argnames=("statics", "height", "width", "supersample"))
def _march_gnomonic(
    slices,  # [NP, nu, C, nv] bf16 (repacked position slices)
    rotation,  # [3, 3] f32
    origin,  # [3] f32
    statics: GnomonicStatics,
    height: int,
    width: int,
    focal,
    supersample: float,
):
    """Resample + composite in gnomonic space. Returns (state [SROWS, Pn, Qn],
    x-range, y-range) — everything needed by the warp."""
    Pn, Qn, PB, Pb = gnomonic_frame(None, height, width, focal, supersample, statics)
    QB, Qb = _qb_blocks(statics, Qn)
    nv = slices.shape[3]
    if _use_fused_composite(statics, nv):
        geo = gnomonic_geometry(
            rotation, origin, statics, height, width, focal, supersample,
            lite=True, skip_basis=True,
        )
        occupancy = gnomonic_occupancy_lite(
            slices, geo.geom, statics, Pn, Qn, PB, Pb, QB, Qb
        )
        state = composite_positions_fused(
            slices, None, None, geo.geom, statics, Pn, Qn, PB, Pb,
            occupancy, xr=geo.xr, yr=geo.yr,
        )
        return state, geo.xr, geo.yr
    geo = gnomonic_geometry(
        rotation, origin, statics, height, width, focal, supersample
    )
    t1 = resample_u(slices, geo.Ru)
    occupancy = gnomonic_occupancy(
        slices, geo.Ru, statics, PB, Pb,
        RvT=geo.RvT if QB > 1 else None, QB=QB,
    )
    state = composite_positions(
        t1, geo.RvT, geo.ybasis, geo.live_u, geo.live_v, geo.norm, geo.geom,
        statics, Pn, Qn, PB, Pb, occupancy=occupancy,
    )
    return state, geo.xr, geo.yr


_BSPLINE_POLE = -0.26794919243112270647  # sqrt(3) - 2


def _bspline_prefilter_axis0(a):
    """Exact cubic-B-spline interpolation prefilter along axis 0 (causal +
    anticausal first-order recursions, Unser 1999), lax.scan over rows."""
    z = _BSPLINE_POLE
    n = a.shape[0]
    lam = (1.0 - z) * (1.0 - 1.0 / z)
    a = a * lam
    # causal init: truncated geometric sum of the first rows
    k = jnp.arange(min(n, 30), dtype=jnp.float32)
    w = z ** k
    c0 = jnp.tensordot(w, a[: w.shape[0]], axes=(0, 0))

    def fwd(carry, x):
        c = x + z * carry
        return c, c

    _, cplus = jax.lax.scan(fwd, c0, a[1:])
    cplus = jnp.concatenate([c0[None], cplus], axis=0)
    # anticausal init (Unser/Thevenaz): c-[N-1] = z/(z^2-1) * (z*c+[N-2] + c+[N-1])
    cN = (z / (z * z - 1.0)) * (z * cplus[-2] + cplus[-1])

    def bwd(carry, x):
        c = z * (carry - x)
        return c, c

    _, cminus = jax.lax.scan(bwd, cN, cplus[:-1][::-1])
    return jnp.concatenate([cminus[::-1], cN[None]], axis=0)


def _bspline_prefilter(img):
    """Separable B-spline coefficient transform of [Pn, Qn, C]."""
    img = _bspline_prefilter_axis0(img)
    img = jnp.swapaxes(_bspline_prefilter_axis0(jnp.swapaxes(img, 0, 1)), 0, 1)
    return img


@partial(jax.jit, static_argnames=("statics", "height", "width", "supersample",
                                   "white_bkgd", "frame", "warp_order",
                                   "warp_impl", "warp_swap"))
def _warp_to_camera(
    state,  # [SROWS, Pn, Qn] composited gnomonic state
    xr,
    yr,
    rotation,
    statics: GnomonicStatics,
    height: int,
    width: int,
    focal,
    supersample: float,
    white_bkgd: bool,
    frame: Optional[Tuple[int, int]] = None,
    warp_order: int = 3,
    warp_impl: str = "gather",
    warp_swap: bool = False,
):
    axis = statics.axis
    u_ax, v_ax = _uv_axes(axis)
    g = -1.0 if statics.flip else 1.0
    if frame is not None:
        Pn, Qn = frame
    else:
        Pn, Qn, _PB, _Pb = gnomonic_frame(
            None, height, width, focal, supersample, statics
        )
    if warp_impl == "matmul":
        from thr3ed_atom_tpu.rendering.warp_matmul import warp_state_matmul

        out = warp_state_matmul(
            state, xr, yr, rotation, statics, height, width, focal, Pn, Qn,
            int(warp_order), bool(warp_swap), statics.interpret,
        )
        # |R @ dirs_cam| = |dirs_cam| (R orthonormal) — no pixel-dir field
        px = jnp.arange(width, dtype=jnp.float32) + 0.5
        py = jnp.arange(height, dtype=jnp.float32) + 0.5
        cx = (px[None, :] - width / 2) / focal
        cy = -(py[:, None] - height / 2) / focal
        dnorm = jnp.sqrt(1.0 + cx * cx + cy * cy)[..., None]
        return _finalize_warped(out, dnorm, statics, white_bkgd)
    x0, x1 = xr
    y0, y1 = yr
    nch = 8 if statics.with_diffuse else 5
    # channels: colR, colG, colB, acc, dep (, difR, difG, difB)
    src = jnp.moveaxis(state, 0, -1)[..., 1:1 + nch]  # [Pn, Qn, nch]
    # pad rows to 8 channels = 32 bytes: TPU gather throughput is per ALIGNED
    # row (measured round 1: 32-byte rows ~5x faster than misaligned ones)
    gch = -(-nch // 8) * 8
    if gch != nch:
        src = jnp.pad(src, ((0, 0), (0, 0), (0, gch - nch)))

    px = jnp.arange(width, dtype=jnp.float32) + 0.5
    py = jnp.arange(height, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(px, py, indexing="xy")
    dirs_cam = jnp.stack(
        [(gx - width / 2) / focal, -(gy - height / 2) / focal,
         -jnp.ones_like(gx)],
        axis=-1,
    )
    d = jnp.einsum("ij,hwj->hwi", rotation, dirs_cam,
                   precision=jax.lax.Precision.HIGHEST)
    x = g * d[..., u_ax] / d[..., axis]
    y = g * d[..., v_ax] / d[..., axis]
    p = (x - x0) / (x1 - x0) * (Pn - 1)
    q = (y - y0) / (y1 - y0) * (Qn - 1)
    p0 = jnp.clip(jnp.floor(p), 0, Pn - 2).astype(jnp.int32)
    q0 = jnp.clip(jnp.floor(q), 0, Qn - 2).astype(jnp.int32)
    fp = p - p0
    fq = q - q0
    flat = src.reshape(Pn * Qn, gch)

    def gat(dp, dq, table=None):
        # clamped taps (the bicubic stencil reaches 1 texel outside the frame)
        pi = jnp.clip(p0 + dp, 0, Pn - 1)
        qi = jnp.clip(q0 + dq, 0, Qn - 1)
        return jnp.take(flat if table is None else table,
                        pi * Qn + qi, axis=0)

    if warp_order == 5:
        # prefiltered cubic B-spline INTERPOLATION: the separable IIR
        # prefilter (pole z1 = sqrt(3) - 2) turns the texel image into
        # B-spline coefficients, after which the smooth B-spline basis
        # reproduces the samples exactly with a far better frequency response
        # than Catmull-Rom at the same 16 gathered taps — lifts the
        # warp-limited ceiling at zero texel-grid cost. The hull clamp against
        # the UNfiltered bilinear taps still kills ringing and preserves the
        # white-background identity.
        coeffs = _bspline_prefilter(src)  # [Pn, Qn, gch]
        cflat = coeffs.reshape(Pn * Qn, gch)

        def bsplw(t):
            t2 = t * t
            t3 = t2 * t
            return (
                (1.0 - 3.0 * t + 3.0 * t2 - t3) / 6.0,
                (4.0 - 6.0 * t2 + 3.0 * t3) / 6.0,
                (1.0 + 3.0 * t + 3.0 * t2 - 3.0 * t3) / 6.0,
                t3 / 6.0,
            )

        wps = bsplw(fp)
        wqs = bsplw(fq)
        out = 0.0
        for ip, wp in enumerate(wps):
            row = 0.0
            for iq, wq in enumerate(wqs):
                row = row + gat(ip - 1, iq - 1, cflat) * wq[..., None]
            out = out + row * wp[..., None]
    elif warp_order == 3:
        # separable Catmull-Rom: C1 reconstruction of the supersampled state.
        # The composited gnomonic field is smooth (it is an integral), so the
        # cubic's higher-order accuracy dominates the bilinear tent's O(h^2)
        # smoothing — this clears the warp-limited quality ceiling measured
        # with the bilinear tap (~79 dB vs exact at production scale).
        def cubw(t):
            t2 = t * t
            t3 = t2 * t
            return (
                -0.5 * t3 + t2 - 0.5 * t,
                1.5 * t3 - 2.5 * t2 + 1.0,
                -1.5 * t3 + 2.0 * t2 + 0.5 * t,
                0.5 * t3 - 0.5 * t2,
            )

        wps = cubw(fp)
        wqs = cubw(fq)
        out = 0.0
        for ip, wp in enumerate(wps):
            row = 0.0
            for iq, wq in enumerate(wqs):
                row = row + gat(ip - 1, iq - 1) * wq[..., None]
            out = out + row * wp[..., None]
    elif warp_order == 1:
        out = (
            gat(0, 0) * ((1 - fp) * (1 - fq))[..., None]
            + gat(1, 0) * (fp * (1 - fq))[..., None]
            + gat(0, 1) * ((1 - fp) * fq)[..., None]
            + gat(1, 1) * (fp * fq)[..., None]
        )  # [H, W, nch]
    else:
        raise ValueError(
            f"gnomonic_warp_order must be 1 (bilinear), 3 (Catmull-Rom) or "
            f"5 (prefiltered B-spline); got {warp_order}"
        )
    if warp_order in (3, 5):
        # clamp cubics to the bilinear tap hull: kills ringing (keeps empty
        # background EXACTLY empty — the white-bkgd identity) while retaining
        # the cubic's sharpness in smooth regions
        c00, c10, c01, c11 = gat(0, 0), gat(1, 0), gat(0, 1), gat(1, 1)
        lo = jnp.minimum(jnp.minimum(c00, c10), jnp.minimum(c01, c11))
        hi = jnp.maximum(jnp.maximum(c00, c10), jnp.maximum(c01, c11))
        out = jnp.clip(out, lo, hi)

    # depth in world units -> reference convention (units of the pinhole dir)
    dnorm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    return _finalize_warped(out, dnorm, statics, white_bkgd)


def _finalize_warped(out, dnorm, statics: GnomonicStatics, white_bkgd: bool):
    """Shared post-warp channel unpacking (gather and matmul warp paths)."""
    colour = out[..., 0:3]
    acc = out[..., 3:4]
    depth = out[..., 4:5] / dnorm
    if white_bkgd:
        colour = colour + (1.0 - acc)
    disparity = 1.0 / jnp.maximum(ZERO_PLUS, depth / jnp.maximum(acc, ZERO_PLUS))
    extra = {
        EXTRA_DISPARITY: disparity,
        EXTRA_ACCUMULATED_WEIGHTS: acc,
    }
    if statics.with_diffuse:
        diffuse = out[..., 5:8]
        if white_bkgd:
            diffuse = diffuse + (1.0 - acc)
        extra[EXTRA_DIFFUSE_COLOUR] = diffuse
    return RenderOut(colour=colour, depth=depth, extra=extra)


# ------------------------------------------------------------------ public API


DEFAULT_SUPERSAMPLE = 1.25

# texel-density floor: the warp's reconstruction error on voxel-sharp content
# is set by TEXELS PER VOXEL, not texels per pixel. At production shapes the
# image already oversamples the grid (400 px / 128 voxels ~ 3.9 texels/voxel
# at ss 1.25 -> 77+ dB vs exact), but at small images the default drops to
# ~1.25 texels/voxel and agreement on sharp trained scenes falls to ~44 dB,
# improving ~2 dB per supersample doubling (measured: PARITY_RUN.md
# cross-eval + the P/ss sweep on a trained 64^3 grid). The floor only
# engages when the image is small relative to the grid, where texels are
# cheap anyway; capped to bound the texel cost.
_TEXELS_PER_VOXEL_FLOOR = 2.5
_SUPERSAMPLE_CAP = 4.0


def effective_supersample(config_ss: float, statics: GnomonicStatics,
                          height: int, width: int) -> float:
    u_ax, v_ax = _uv_axes(statics.axis)
    nmax = max(statics.dims[u_ax], statics.dims[v_ax])
    floor = _TEXELS_PER_VOXEL_FLOOR * nmax / max(1, min(height, width))
    return float(max(config_ss, min(_SUPERSAMPLE_CAP, floor)))

_repack_jit = jax.jit(repack_position_slices, static_argnums=(1, 2, 3))


def render_image_gnomonic(
    voxel_grid: VoxelGrid,
    camera_pose,
    camera_intrinsics,
    config,
    key: Optional[jax.Array] = None,
    cache: Optional[dict] = None,
    interpret: Optional[bool] = None,
) -> RenderOut:
    """Full-image render via the gnomonic shear-warp pipeline (pose-level API).

    The per-pose repacked position-slice stack is cached in ``cache`` (keyed by
    march axis/flip/P, invalidated when the grid arrays change)."""
    del key  # deterministic
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
        with_diffuse=want_diffuse,
        pos_per_cell=getattr(config, "gnomonic_pos_per_cell", 0),
        exit_eps=float(getattr(config, "gnomonic_exit_eps", 0.0)),
        interpret=interpret,
        qb=int(getattr(config, "gnomonic_qb", 0)),
    )
    supersample = effective_supersample(
        float(getattr(config, "gnomonic_supersample", DEFAULT_SUPERSAMPLE)),
        statics, int(camera_intrinsics.height), int(camera_intrinsics.width),
    )

    vertex = use_fused_composite(statics)
    slices = None
    cache_key = ("gnomonic", axis, flip, statics.pos_per_cell, vertex)
    if cache is not None:
        entry = cache.get(cache_key)
        if (
            entry is not None
            and entry[0] is voxel_grid.densities
            and entry[1] is voxel_grid.features
        ):
            slices = entry[2]
    if slices is None:
        slices = _repack_jit(voxel_grid, statics, True, vertex)
        if cache is not None:
            cache[cache_key] = (voxel_grid.densities, voxel_grid.features, slices)

    rot_j = jnp.asarray(rotation, jnp.float32)
    origin = jnp.asarray(
        np.asarray(camera_pose.translation), jnp.float32
    ).reshape(3)
    height = int(camera_intrinsics.height)
    width = int(camera_intrinsics.width)
    focal = float(camera_intrinsics.focal)
    state, xr, yr = _march_gnomonic(
        slices, rot_j, origin, statics, height, width, focal, supersample
    )
    warp_impl = str(getattr(config, "gnomonic_warp_impl", "auto"))
    if warp_impl == "auto":
        warp_impl = "matmul"
    warp_swap = False
    if warp_impl == "matmul":
        from thr3ed_atom_tpu.rendering.warp_matmul import warp_swap_for_pose

        warp_swap = warp_swap_for_pose(rotation, axis, flip, height, width,
                                       focal)
    return _warp_to_camera(
        state, xr, yr, rot_j, statics, height, width, focal, supersample,
        bool(config.white_bkgd),
        warp_order=int(getattr(config, "gnomonic_warp_order", 3)),
        warp_impl=warp_impl,
        warp_swap=warp_swap,
    )


@partial(jax.jit, static_argnames=("statics", "height", "width", "supersample",
                                   "white_bkgd", "warp_order", "warp_impl",
                                   "warp_swap"))
def _render_poses_batched(slices, rotations, origins, focal, statics, height,
                          width, supersample, white_bkgd, warp_order,
                          warp_impl, warp_swap):
    """lax.map the march+warp over a stack of poses sharing one march-axis
    variant — ONE device dispatch for the whole stack. Under the axon tunnel a
    dispatch costs ~4.3 ms of host time (experiments/probe_dispatch_share.py),
    which bounds per-pose rendering at ~230 poses/s no matter how fast the
    device gets; batching removes the host from the per-pose path entirely."""

    nv = slices.shape[3]
    if _use_fused_composite(statics, nv):
        # round-5: the per-pose geometry is dozens of TINY ops (geom [NP, 8],
        # corner ranges) — inside the lax.map body they execute as ~0.6 ms of
        # small-kernel launches PER POSE. Hoisting them as one vmapped batch
        # over all poses turns that into one batched chain for the whole
        # stack; the map body keeps only the three heavy stages.
        Pn, Qn, PB, Pb = gnomonic_frame(None, height, width, focal,
                                        supersample, statics)
        QB, Qb = _qb_blocks(statics, Qn)
        geo_b = jax.vmap(
            lambda rot, org: gnomonic_geometry(
                rot, org, statics, height, width, focal, supersample,
                lite=True, skip_basis=True,
            )
        )(rotations, origins)

        def one_fused(args):
            geom, x0, x1, y0, y1, rot = args
            xr, yr = (x0, x1), (y0, y1)
            occupancy = gnomonic_occupancy_lite(
                slices, geom, statics, Pn, Qn, PB, Pb, QB, Qb
            )
            state = composite_positions_fused(
                slices, None, None, geom, statics, Pn, Qn, PB, Pb,
                occupancy, xr=xr, yr=yr,
            )
            return _warp_to_camera(
                state, xr, yr, rot, statics, height, width, focal,
                supersample, white_bkgd, warp_order=warp_order,
                warp_impl=warp_impl, warp_swap=warp_swap,
            )

        return jax.lax.map(
            one_fused,
            (geo_b.geom, geo_b.xr[0], geo_b.xr[1], geo_b.yr[0], geo_b.yr[1],
             rotations),
        )

    def one(ro):
        rot, org = ro
        state, xr, yr = _march_gnomonic(
            slices, rot, org, statics, height, width, focal, supersample
        )
        return _warp_to_camera(
            state, xr, yr, rot, statics, height, width, focal, supersample,
            white_bkgd, warp_order=warp_order, warp_impl=warp_impl,
            warp_swap=warp_swap,
        )

    return jax.lax.map(one, (rotations, origins))


@partial(jax.jit, static_argnames=("statics_tuple", "height", "width",
                                   "ss_tuple", "white_bkgd", "warp_order",
                                   "warp_impl", "swap_tuple"))
def _render_poses_switch(slices_tuple, rotations, origins, vidx, focal,
                         statics_tuple, height, width, ss_tuple, white_bkgd,
                         warp_order, warp_impl, swap_tuple):
    """ONE dispatch for a mixed-variant pose stack (round-5): each pose's
    march variant selects its branch via lax.switch inside a single lax.map,
    so a whole render pass is one executable + one host dispatch instead of
    one per (variant, chunk). Every variant's vertex-slice stack rides along
    (the caller gates on total slices bytes — at 256^3 a 6-variant stack
    would not fit HBM and the per-group path is used instead)."""

    def one(args):
        rot, org, v = args

        def make_branch(b):
            st = statics_tuple[b]

            def branch(ro):
                rot_, org_ = ro
                state, xr, yr = _march_gnomonic(
                    slices_tuple[b], rot_, org_, st, height, width, focal,
                    ss_tuple[b],
                )
                return _warp_to_camera(
                    state, xr, yr, rot_, st, height, width, focal,
                    ss_tuple[b], white_bkgd, warp_order=warp_order,
                    warp_impl=warp_impl, warp_swap=swap_tuple[b],
                )

            return branch

        branches = [make_branch(b) for b in range(len(statics_tuple))]
        return jax.lax.switch(v, branches, (rot, org))

    return jax.lax.map(one, (rotations, origins, vidx))


def render_poses_gnomonic(
    voxel_grid: VoxelGrid,
    camera_poses,
    camera_intrinsics,
    config,
    key: Optional[jax.Array] = None,
    cache: Optional[dict] = None,
    interpret: Optional[bool] = None,
    group_batch: int = 32,
) -> RenderOut:
    """Render a SEQUENCE of camera poses through the gnomonic pipeline with
    batched dispatch: poses are grouped by their (march axis, flip, warp-pass
    order) variant, each group renders in one jitted lax.map (at most 12
    programs regardless of pose count), and the outputs are re-assembled in
    input order with a leading pose axis. ``group_batch`` bounds the per-
    dispatch output footprint (k * H * W * 8 f32).

    This is the TPU-idiomatic form of the reference's per-pose render loop
    (thre3d_atom/visualizations/animations.py:17-64): same per-pose outputs,
    amortized dispatch."""
    del key  # deterministic
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    want_diffuse = bool(
        getattr(config, "also_render_diffuse", False)
        or getattr(config, "render_diffuse", False)
    )
    height = int(camera_intrinsics.height)
    width = int(camera_intrinsics.width)
    focal = float(camera_intrinsics.focal)
    warp_impl = str(getattr(config, "gnomonic_warp_impl", "auto"))
    if warp_impl == "auto":
        warp_impl = "matmul"
    warp_order = int(getattr(config, "gnomonic_warp_order", 3))

    rotations = [
        np.asarray(p.rotation, np.float32).reshape(3, 3) for p in camera_poses
    ]
    origins = [
        np.asarray(p.translation, np.float32).reshape(3) for p in camera_poses
    ]
    groups: dict = {}
    for i, rot in enumerate(rotations):
        axis, flip = dominant_axis_for_pose(rot)
        swap = False
        if warp_impl == "matmul":
            from thr3ed_atom_tpu.rendering.warp_matmul import warp_swap_for_pose

            swap = warp_swap_for_pose(rot, axis, flip, height, width, focal)
        groups.setdefault((axis, flip, swap), []).append(i)

    # per-variant resources (statics, supersample, repacked slices)
    var_keys = list(groups)
    var_statics: list = []
    var_ss: list = []
    var_slices: list = []
    for axis, flip, swap in var_keys:
        statics = statics_for_grid(
            voxel_grid,
            axis,
            flip,
            with_diffuse=want_diffuse,
            pos_per_cell=getattr(config, "gnomonic_pos_per_cell", 0),
            exit_eps=float(getattr(config, "gnomonic_exit_eps", 0.0)),
            interpret=interpret,
            qb=int(getattr(config, "gnomonic_qb", 0)),
        )
        supersample = effective_supersample(
            float(getattr(config, "gnomonic_supersample", DEFAULT_SUPERSAMPLE)),
            statics, height, width,
        )
        vertex = use_fused_composite(statics)
        slices = None
        cache_key = ("gnomonic", axis, flip, statics.pos_per_cell, vertex)
        if cache is not None:
            entry = cache.get(cache_key)
            if (
                entry is not None
                and entry[0] is voxel_grid.densities
                and entry[1] is voxel_grid.features
            ):
                slices = entry[2]
        if slices is None:
            slices = _repack_jit(voxel_grid, statics, True, vertex)
            if cache is not None:
                cache[cache_key] = (
                    voxel_grid.densities, voxel_grid.features, slices
                )
        var_statics.append(statics)
        var_ss.append(supersample)
        var_slices.append(slices)

    order: list = []
    outputs: list = []
    # NOTE (round-5 negative result, chip-measured): merging all variants
    # into one dispatch per chunk (lax.switch on the pose's variant inside
    # one lax.map) is SLOWER than per-variant-group dispatches — 40.4M vs
    # 45.0M rays/s on the 100-pose bench. The saved host dispatches were
    # already hidden behind device compute; the mixed-variant loop body
    # costs more than they did. Kept behind a default-off flag for
    # re-evaluation on faster-host deployments.
    use_switch = bool(getattr(config, "gnomonic_single_dispatch", False))
    total_slices_bytes = sum(int(s.nbytes) for s in var_slices)
    if use_switch and len(var_keys) > 1 and total_slices_bytes <= 2 * 1024**3:
        # single-dispatch mixed-variant path: every variant's slices fit HBM
        # together, so each chunk of poses (in INPUT order, variants mixed)
        # renders as one lax.map whose body lax.switches on the pose's
        # variant — one executable + one dispatch per chunk instead of one
        # per (variant, chunk)
        pose_variant = np.empty(len(rotations), np.int32)
        for b, vk in enumerate(var_keys):
            pose_variant[np.asarray(groups[vk], np.int64)] = b
        n = len(rotations)
        for start in range(0, n, group_batch):
            chunk = list(range(start, min(start + group_batch, n)))
            order.extend(chunk)
            outputs.append(
                _render_poses_switch(
                    tuple(var_slices),
                    jnp.asarray(np.stack([rotations[i] for i in chunk])),
                    jnp.asarray(np.stack([origins[i] for i in chunk])),
                    jnp.asarray(pose_variant[np.asarray(chunk)]),
                    jnp.float32(focal),
                    tuple(var_statics),
                    height,
                    width,
                    tuple(var_ss),
                    bool(config.white_bkgd),
                    warp_order,
                    warp_impl,
                    tuple(vk[2] for vk in var_keys),
                )
            )
    else:
        for b, (axis, flip, swap) in enumerate(var_keys):
            idx = groups[(axis, flip, swap)]
            for start in range(0, len(idx), group_batch):
                chunk = idx[start:start + group_batch]
                order.extend(chunk)
                outputs.append(
                    _render_poses_batched(
                        var_slices[b],
                        jnp.asarray(np.stack([rotations[i] for i in chunk])),
                        jnp.asarray(np.stack([origins[i] for i in chunk])),
                        jnp.float32(focal),
                        var_statics[b],
                        height,
                        width,
                        var_ss[b],
                        bool(config.white_bkgd),
                        warp_order,
                        warp_impl,
                        swap,
                    )
                )
    inverse = np.empty(len(order), np.int64)
    inverse[np.asarray(order)] = np.arange(len(order))
    inv = jnp.asarray(inverse)
    return jax.tree_util.tree_map(
        lambda *xs: jnp.take(jnp.concatenate(xs, axis=0), inv, axis=0),
        *outputs,
    )


class _GnomonicProcedure:
    """RENDER_PROCEDURES entry: gnomonic rendering is pose-structured — whole
    camera poses go through render_image (VolumetricModel.render dispatches
    there). Arbitrary flat ray sets (reference render_interface.py:103-134
    semantics) are served by an explicit, logged switch to the fast two-phase
    procedure, which shares the grid's activation/SH conventions exactly."""

    prepare = None
    render_image = staticmethod(render_image_gnomonic)
    render_poses = staticmethod(render_poses_gnomonic)
    _warned_flat_rays = False

    def __call__(self, voxel_grid, rays, render_config, key=None, prepared=None):
        from thr3ed_atom_tpu.rendering.fast_renderer import (
            render_sh_voxel_grid_fast,
        )
        from thr3ed_atom_tpu.utils.logging import log

        if not _GnomonicProcedure._warned_flat_rays:
            log.info(
                "render_sh_voxel_grid_gnomonic: flat ray batch requested; the "
                "shear-warp pipeline is pose-structured, routing these rays "
                "through render_sh_voxel_grid_fast (whole-pose renders keep "
                "the gnomonic pipeline)"
            )
            _GnomonicProcedure._warned_flat_rays = True
        return render_sh_voxel_grid_fast(voxel_grid, rays, render_config, key)


render_sh_voxel_grid_gnomonic = _GnomonicProcedure()
