"""Differentiable gnomonic shear-warp pipeline: the round-3 training path.

Training replaces the reference's per-ray-batch autograd
(thre3d_atom/modules/trainers.py:271-341 driving voxels.py:295-321 double
grid_sample backward) with whole-pose gradient steps through the gnomonic
pipeline (rendering/gnomonic.py): repack -> u-resample (XLA einsum, autodiff)
-> fused composite Pallas kernel (hand-written replay VJP, this module) ->
projective warp (XLA take, scatter-add adjoint) -> L1 loss on real pixels.
One step trains every pixel of one training view (H*W rays vs the reference's
16K ray batch) with the same objective (specular L1 + diffuse L1
regularization, reference trainers.py:311-330).

Backward kernel design (mirrors ops/pallas/plane_march.py's replay VJP):
march positions front-to-back a second time, rebuilding transmittance T and
the running inner-product prefix; the per-cell dL/d(integral) uses the
division-free suffix form

    dinteg = delta * ((1 - alpha) * T * inner - suffix),
    suffix = S_total - S_prefix (+ gT * T_final),

with S_total = sum_rows gstate * state computed once outside the kernel. The
closed-form (dI/da, dI/db) of the relu-trapezoid routes dinteg onto the
cell's two endpoint positions; colour/diffuse cotangents lerp back with
(1 - tbar, tbar) with the emission centroid tbar treated as constant (the
same quadrature-level convention as plane_march.py's VJP). Each position's
assembled dvals fold back through the SH basis rows and one MXU matmul
against the untransposed v-tents to produce dt1; XLA's einsum adjoint then
carries dt1 -> dslices -> d(grid).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from thr3ed_atom_tpu.models.voxels import VoxelGrid
from thr3ed_atom_tpu.ops.pallas.plane_march import _relu_trap
from thr3ed_atom_tpu.rendering.gnomonic import (
    GnomonicStatics,
    _padded_channels,
    _sprows,
    _num_positions,
    _mix_vertex_slices,
    _vertex_index_maps,
    composite_positions,
    frame_rounding,
    gnomonic_geometry,
    gnomonic_occupancy,
    repack_position_slices,
    resample_u,
    statics_for_grid,
    _warp_to_camera,
)
from thr3ed_atom_tpu.utils.constants import EXTRA_DIFFUSE_COLOUR
from thr3ed_atom_tpu.utils.metrics import mse2psnr

# above this repacked-slice size, gnomonic_train_step_multi scans over bf16
# slices to fit HBM at 256^3 alongside the grid + Adam moments (see its
# docstring); below it, the step is bit-identical to the per-pose form
_BF16_SLICES_BYTES = 512 * 1024 * 1024


# --------------------------------------------------------------- train blocking


def _p_blocking_train(Pn_raw: int, Qn: int, nv: int, C: int,
                      with_diffuse: bool, qb_acc: bool = False):
    """u-axis blocking sized for the BACKWARD kernel's VMEM working set (the
    replay adds dvals, the dt1 output double-buffer and the pending/carry
    rows on top of the forward's buffers). ``qb_acc`` adds the q-split
    backward's f32 dt1 accumulator scratch (kept out of the stripe path's
    estimate so the measured stripe blocking is unchanged)."""
    SROWS, PROWS = _sprows(with_diffuse)
    budget = 88 * 1024 * 1024
    PB = 1
    while True:
        Pb = -(-Pn_raw // (8 * PB)) * 8
        est = (
            4 * C * Pb * Qn  # vals f32
            + 2 * C * Pb * Qn  # dvals bf16
            + 4 * (SROWS + 2) * Pb * Qn  # gaux block
            + 4 * (PROWS + (PROWS - 1) + 2) * Pb * Qn  # prev + pend + carry
            + 4 * 16 * Pb * Qn  # ybasis block (<= 16 rows)
            + 2 * 2 * C * Pb * nv * 2  # t1 + dt1 double buffers
            + (4 * C * Pb * nv if qb_acc else 0)  # q-split f32 dt1 acc
        )
        if est <= budget or PB >= 64:
            return PB, Pb, PB * Pb
        PB *= 2


def gnomonic_frame_train(height: int, width: int, supersample: float,
                         statics: GnomonicStatics):
    """(Pn, Qn, PB, Pb) for the training pipeline (backward-sized blocking).
    Texel rounding is shared with the render frame (gnomonic.frame_rounding);
    only the VMEM blocking differs (the replay backward carries more rows)."""
    Pn_raw, Qn, nv, C = frame_rounding(height, width, supersample, statics)
    PB, Pb, Pn = _p_blocking_train(Pn_raw, Qn, nv, C, statics.with_diffuse,
                                   qb_acc=statics.qb > 0)
    return Pn, Qn, PB, Pb


# ------------------------------------------------- fused (v3) train blocking


def _fused_train_blocking(Pn_raw: int, Qn: int, nu: int, nv: int, C: int,
                          ncoeff: int, with_diffuse: bool, qb: int):
    """(PB, Pb, Pn) for the FUSED backward kernel, or None if its frame-
    resident VMEM working set cannot fit. Unlike the v2 backward (u-blocks
    outermost), the fused backward iterates positions outermost so the whole
    frame's carries persist in scratch — most of the working set is
    Pn*Qn-proportional and independent of the blocking; Pb only sizes the
    per-(position, u-block) matmul operands."""
    SROWS, PROWS = _sprows(with_diffuse)
    NDM = PROWS - 1
    Qb = qb if (qb > 0 and Qn > qb and Qn % qb == 0) else Qn
    budget = 100 * 1024 * 1024
    # start at Pb = 128 (fine u-blocking), not PB = 1: positions iterate
    # outermost so extra u-blocks cost no slice DMA, and occupancy gating at
    # Pb = 128 skips ~2x more of the replay/cotangent work than whole-stripe
    # blocks at 128^3/400px (probe_composite_cost; frame_rounding guarantees
    # 128 | Pn_raw) while keeping every dot's M a full MXU row tile
    PB = max(1, Pn_raw // 128)
    while True:
        Pb = -(-Pn_raw // (8 * PB)) * 8
        Pn = PB * Pb
        frame_resident = 4 * Pn * Qn * (
            (PROWS + NDM + 2)  # prev + pend + carry scratch
            + (SROWS + 2)  # gaux (VMEM-resident constant block)
            + ncoeff + 1  # ybasis + norm (VMEM-resident constant blocks)
        )
        per_pb = (
            2 * C * Pb * nv  # t1m (replayed position values, bf16)
            + 4 * C * Pb * nv  # dt1 f32 accumulator
            + (4 + 2) * C * Pb * Qb  # per-channel vals/dvals temporaries
        )
        est = (
            frame_resident
            + per_pb
            + 4 * nu * C * nv  # dslices f32 accumulator
            + 2 * 2 * nu * C * nv * 2  # slices in + dsl out, double-buffered
        )
        if est <= budget:
            return PB, Pb, Pn
        if PB >= 64 or per_pb < (est - budget):
            return None  # frame-resident set alone exceeds budget
        PB *= 2


def fused_train_frame(height: int, width: int, supersample: float,
                      statics: GnomonicStatics):
    """(Pn, Qn, PB, Pb) for the fused train pipeline, or None when the fused
    backward is unsupported for this (statics, shape): needs the q-split
    statics (qb > 0), lane-aligned grid slabs (nv % 128, like the fused render
    path — gnomonic._use_fused_composite), and a frame whose carries fit VMEM."""
    from thr3ed_atom_tpu.rendering.bricked import _uv_axes

    if statics.qb <= 0:
        return None
    u_ax, v_ax = _uv_axes(statics.axis)
    nu = statics.dims[u_ax]
    Pn_raw, Qn, nv, C = frame_rounding(height, width, supersample, statics)
    if nv % 128 != 0 and not statics.interpret:
        return None
    blocking = _fused_train_blocking(
        Pn_raw, Qn, nu, nv, C, statics.ncoeff, statics.with_diffuse, statics.qb
    )
    if blocking is None:
        return None
    PB, Pb, Pn = blocking
    return Pn, Qn, PB, Pb


# --------------------------------------------------------------- backward kernel


def _make_backward_kernel(NP, Pb, Qn, nv, C, ncoeff, relu_sigma, with_diffuse):
    """Replay VJP over positions; grid=(PB, NP + 1). Iteration j recomputes
    position min(j, NP-1) and cell j; position j-1's completed cotangent is
    folded to dvals and matmul'd to dt1[j-1] (the extra final iteration
    flushes position NP-1). Occupancy flags (gnomonic_occupancy) skip both
    matmuls for iterations whose position AND output are dead — exactly
    gradient-lossless (a both-endpoints-empty cell has identically zero
    integral and zero density gradient)."""
    SROWS, PROWS = _sprows(with_diffuse)
    LROW = PROWS - 1
    NDM = PROWS - 1  # pending rows: dsig + drgb*3 (+ ddif*3)

    def kernel(geom_ref, cl_ref, pn_ref, t1_ref, rvt_ref, rv_ref, yb_ref,
               lu_ref, lv_ref, norm_ref, gaux_ref, dt1_ref, prev_ref,
               pend_ref, carry_ref):
        pb = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            carry_ref[0] = jnp.ones((Pb, Qn), jnp.float32)  # transmittance
            carry_ref[1] = jnp.zeros((Pb, Qn), jnp.float32)  # inner prefix
            pend_ref[...] = jnp.zeros_like(pend_ref)

        jc = jnp.minimum(j, NP - 1)  # geom/flag rows are [NP]; j reaches NP
        jp = jnp.maximum(j - 1, 0)
        live_replay = pn_ref[pb, jc] > 0  # position j feeds a live cell
        live_out = (j > 0) & (pn_ref[pb, jp] > 0)  # dt1[j-1] is nonzero
        work = live_replay | live_out

        @pl.when(jnp.logical_not(work))
        def _():
            # dead iteration: the output block must still be written, and the
            # pending rows must reflect cell j's (zero) b-side contribution
            pend_ref[...] = jnp.zeros_like(pend_ref)

            @pl.when(j > 0)
            def _():
                dt1_ref[...] = jnp.zeros_like(dt1_ref)

        @pl.when(work)
        def _():
            _work_body(geom_ref, cl_ref, t1_ref, rvt_ref, rv_ref, yb_ref,
                       lu_ref, lv_ref, norm_ref, gaux_ref, dt1_ref, prev_ref,
                       pend_ref, carry_ref, j, jc, pb)

    def _work_body(geom_ref, cl_ref, t1_ref, rvt_ref, rv_ref, yb_ref, lu_ref,
                   lv_ref, norm_ref, gaux_ref, dt1_ref, prev_ref, pend_ref,
                   carry_ref, j, jc, pb):
        # ---- replay position jj = min(j, NP-1) (garbage-masked for j == NP)
        vals = jnp.dot(
            t1_ref[0].reshape(C * Pb, nv), rvt_ref[0],
            preferred_element_type=jnp.float32,
        )
        livem = jnp.broadcast_to(lu_ref[0] * lv_ref[0], (Pb, Qn))
        sig = vals[3 * ncoeff * Pb:(3 * ncoeff + 1) * Pb, :]

        def fold(colour, coeffs):
            acc = yb_ref[0] * vals[(colour * ncoeff) * Pb:(colour * ncoeff + 1) * Pb]
            for k in range(1, coeffs):
                ch = colour * ncoeff + k
                acc += yb_ref[k] * vals[ch * Pb:(ch + 1) * Pb]
            return acc

        rgb = [fold(c, ncoeff) for c in range(3)]
        dif = [fold(c, 1) for c in range(3)] if with_diffuse else []

        cell_on = (j > 0) & (j < NP) & (cl_ref[pb, jc] > 0)

        def m(x):  # mask with select (safe against garbage NaNs at j == 0 / NP)
            return jnp.where(cell_on, x, jnp.zeros_like(x))

        # ---- recompute cell j forward quantities (between positions j-1, j)
        sig_a = prev_ref[0]
        live_pair = prev_ref[LROW] * livem
        integ_raw, tbar, dIda, dIdb = _relu_trap(sig_a, sig, relu_sigma)
        integ = integ_raw * live_pair
        cell_step = geom_ref[jc, 1]
        delta = cell_step * norm_ref[...]
        e = jnp.exp(-integ * delta)
        alpha = 1.0 - e
        T = carry_ref[0]
        w = m(alpha * T)
        s_b = geom_ref[jc, 0]
        s_mid = (s_b - cell_step + tbar * cell_step) * norm_ref[...]
        tb1 = 1.0 - tbar

        g_col = [gaux_ref[1 + c] for c in range(3)]
        g_acc = gaux_ref[4]
        g_dep = gaux_ref[5]
        g_dif = [gaux_ref[6 + c] for c in range(3)] if with_diffuse else []
        g_T = gaux_ref[0]
        S_total = gaux_ref[SROWS]
        T_fin = gaux_ref[SROWS + 1]

        mids = [jax.nn.sigmoid(tb1 * prev_ref[1 + c] + tbar * rgb[c]) for c in range(3)]
        inner = g_acc + g_dep * s_mid
        for c in range(3):
            inner += g_col[c] * mids[c]
        if with_diffuse:
            dmids = [
                jax.nn.sigmoid(tb1 * prev_ref[4 + c] + tbar * dif[c])
                for c in range(3)
            ]
            for c in range(3):
                inner += g_dif[c] * dmids[c]

        S_prefix = carry_ref[1] + m(inner * w)
        suffix = (S_total - S_prefix) + g_T * T_fin
        # division-free dL/d(integral): delta * ((1-alpha) * T * inner - suffix).
        # every product is masked AFTER multiplication (0 * NaN from the
        # uninitialized j==0 prev scratch would otherwise leak)
        dinteg = delta * (e * T * inner - suffix) * live_pair
        d_a = m(dinteg * dIda)
        d_b = m(dinteg * dIdb)

        dmraws = [g_col[c] * w * mids[c] * (1.0 - mids[c]) for c in range(3)]
        if with_diffuse:
            ddmraws = [
                g_dif[c] * w * dmids[c] * (1.0 - dmids[c]) for c in range(3)
            ]

        # ---- write dt1 for position j-1: pending (b-side of cell j-1) + this
        # cell's a-side
        @pl.when(j > 0)
        def _():
            dsig_prev = pend_ref[0] + d_a
            drgb_prev = [pend_ref[1 + c] + m(tb1 * dmraws[c]) for c in range(3)]
            if with_diffuse:
                ddif_prev = [
                    pend_ref[4 + c] + m(tb1 * ddmraws[c]) for c in range(3)
                ]
            blocks = []
            for ch in range(C):
                if ch < 3 * ncoeff:
                    c, k = divmod(ch, ncoeff)
                    blk = yb_ref[k] * drgb_prev[c]
                    if with_diffuse and k == 0:
                        blk = blk + yb_ref[0] * ddif_prev[c]
                elif ch == 3 * ncoeff:
                    blk = dsig_prev
                else:
                    blk = jnp.zeros((Pb, Qn), jnp.float32)
                blocks.append(blk)
            dvals = jnp.concatenate(blocks, axis=0)  # [C*Pb, Qn]
            dt1 = jnp.dot(
                dvals.astype(jnp.bfloat16), rv_ref[0],
                preferred_element_type=jnp.float32,
            )  # [C*Pb, nv]
            dt1_ref[...] = dt1.reshape(1, C, Pb, nv).astype(jnp.bfloat16)

        # ---- roll pending to this position's b-side; advance carries
        pend_ref[0] = d_b
        for c in range(3):
            pend_ref[1 + c] = m(tbar * dmraws[c])
        if with_diffuse:
            for c in range(3):
                pend_ref[4 + c] = m(tbar * ddmraws[c])
        carry_ref[0] = jnp.where(cell_on, T * (1.0 - alpha), T)
        carry_ref[1] = jnp.where(cell_on, S_prefix, carry_ref[1])

        # ---- store position values for the next cell
        prev_ref[0] = sig
        for c in range(3):
            prev_ref[1 + c] = rgb[c]
        if with_diffuse:
            for c in range(3):
                prev_ref[4 + c] = dif[c]
        prev_ref[LROW] = livem

    return kernel, SROWS, NDM


def _make_backward_kernel_qb(NP, Pb, Qb, QB, nv, C, ncoeff, relu_sigma,
                             with_diffuse):
    """q-split replay VJP: grid=(PB, NP + 1, QB) with the q-block axis
    innermost. Carries live per q-block in leading-dim-indexed scratch (the
    same layout as gnomonic._make_composite_kernel_qb); each q-block's dvals
    matmul contributes a PARTIAL [C*Pb, nv] dt1 that is accumulated across
    the QB inner steps in an f32 scratch and flushed to the bf16 output at
    qb == QB-1 — so occupancy skipping acts at [Pb, Qb] grain in both matmuls
    while dt1[j-1] is still written exactly once per (pb, j)."""
    SROWS, PROWS = _sprows(with_diffuse)
    LROW = PROWS - 1
    NDM = PROWS - 1  # pending rows: dsig + drgb*3 (+ ddif*3)

    def kernel(geom_ref, cl_ref, pn_ref, t1_ref, rvt_ref, rv_ref, yb_ref,
               lu_ref, lv_ref, norm_ref, gaux_ref, dt1_ref, prev_ref,
               pend_ref, carry_ref, acc_ref):
        pb = pl.program_id(0)
        j = pl.program_id(1)
        qb = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            carry_ref[qb, 0] = jnp.ones((Pb, Qb), jnp.float32)
            carry_ref[qb, 1] = jnp.zeros((Pb, Qb), jnp.float32)
            pend_ref[qb] = jnp.zeros((NDM, Pb, Qb), jnp.float32)

        @pl.when((qb == 0) & (j > 0))
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        jc = jnp.minimum(j, NP - 1)  # geom/flag rows are [NP]; j reaches NP
        jp = jnp.maximum(j - 1, 0)
        live_replay = pn_ref[pb, qb, jc] > 0
        live_out = (j > 0) & (pn_ref[pb, qb, jp] > 0)
        work = live_replay | live_out

        @pl.when(jnp.logical_not(work))
        def _():
            # dead iteration: the pending rows must reflect cell j's (zero)
            # b-side contribution; the acc keeps other q-blocks' partials
            pend_ref[qb] = jnp.zeros((NDM, Pb, Qb), jnp.float32)

        @pl.when(work)
        def _():
            _work_body(geom_ref, cl_ref, t1_ref, rvt_ref, rv_ref, yb_ref,
                       lu_ref, lv_ref, norm_ref, gaux_ref, prev_ref,
                       pend_ref, carry_ref, acc_ref, j, jc, pb, qb)

        @pl.when((j > 0) & (qb == QB - 1))
        def _():
            dt1_ref[...] = acc_ref[...].reshape(
                1, C, Pb, nv).astype(jnp.bfloat16)

    def _work_body(geom_ref, cl_ref, t1_ref, rvt_ref, rv_ref, yb_ref, lu_ref,
                   lv_ref, norm_ref, gaux_ref, prev_ref, pend_ref, carry_ref,
                   acc_ref, j, jc, pb, qb):
        # ---- replay position jj = min(j, NP-1) (garbage-masked for j == NP)
        vals = jnp.dot(
            t1_ref[0].reshape(C * Pb, nv), rvt_ref[0, 0],
            preferred_element_type=jnp.float32,
        )
        livem = jnp.broadcast_to(lu_ref[0] * lv_ref[0, 0], (Pb, Qb))
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
        dif = [fold(c, 1) for c in range(3)] if with_diffuse else []

        cell_on = (j > 0) & (j < NP) & (cl_ref[pb, qb, jc] > 0)

        def m(x):  # mask with select (safe against garbage NaNs at j == 0 / NP)
            return jnp.where(cell_on, x, jnp.zeros_like(x))

        # ---- recompute cell j forward quantities (between positions j-1, j)
        sig_a = prev_ref[qb, 0]
        live_pair = prev_ref[qb, LROW] * livem
        integ_raw, tbar, dIda, dIdb = _relu_trap(sig_a, sig, relu_sigma)
        integ = integ_raw * live_pair
        cell_step = geom_ref[jc, 1]
        delta = cell_step * norm_ref[qb]
        e = jnp.exp(-integ * delta)
        alpha = 1.0 - e
        T = carry_ref[qb, 0]
        w = m(alpha * T)
        s_b = geom_ref[jc, 0]
        s_mid = (s_b - cell_step + tbar * cell_step) * norm_ref[qb]
        tb1 = 1.0 - tbar

        g_col = [gaux_ref[qb, 1 + c] for c in range(3)]
        g_acc = gaux_ref[qb, 4]
        g_dep = gaux_ref[qb, 5]
        g_dif = [gaux_ref[qb, 6 + c] for c in range(3)] if with_diffuse else []
        g_T = gaux_ref[qb, 0]
        S_total = gaux_ref[qb, SROWS]
        T_fin = gaux_ref[qb, SROWS + 1]

        mids = [
            jax.nn.sigmoid(tb1 * prev_ref[qb, 1 + c] + tbar * rgb[c])
            for c in range(3)
        ]
        inner = g_acc + g_dep * s_mid
        for c in range(3):
            inner += g_col[c] * mids[c]
        if with_diffuse:
            dmids = [
                jax.nn.sigmoid(tb1 * prev_ref[qb, 4 + c] + tbar * dif[c])
                for c in range(3)
            ]
            for c in range(3):
                inner += g_dif[c] * dmids[c]

        S_prefix = carry_ref[qb, 1] + m(inner * w)
        suffix = (S_total - S_prefix) + g_T * T_fin
        # division-free dL/d(integral): delta * ((1-alpha) * T * inner - suffix).
        # every product is masked AFTER multiplication (0 * NaN from the
        # uninitialized j==0 prev scratch would otherwise leak)
        dinteg = delta * (e * T * inner - suffix) * live_pair
        d_a = m(dinteg * dIda)
        d_b = m(dinteg * dIdb)

        dmraws = [g_col[c] * w * mids[c] * (1.0 - mids[c]) for c in range(3)]
        if with_diffuse:
            ddmraws = [
                g_dif[c] * w * dmids[c] * (1.0 - dmids[c]) for c in range(3)
            ]

        # ---- accumulate this q-block's partial dt1 for position j-1:
        # pending (b-side of cell j-1) + this cell's a-side
        @pl.when(j > 0)
        def _():
            dsig_prev = pend_ref[qb, 0] + d_a
            drgb_prev = [
                pend_ref[qb, 1 + c] + m(tb1 * dmraws[c]) for c in range(3)
            ]
            if with_diffuse:
                ddif_prev = [
                    pend_ref[qb, 4 + c] + m(tb1 * ddmraws[c]) for c in range(3)
                ]
            blocks = []
            for ch in range(C):
                if ch < 3 * ncoeff:
                    c, k = divmod(ch, ncoeff)
                    blk = yb_ref[qb, k] * drgb_prev[c]
                    if with_diffuse and k == 0:
                        blk = blk + yb_ref[qb, 0] * ddif_prev[c]
                elif ch == 3 * ncoeff:
                    blk = dsig_prev
                else:
                    blk = jnp.zeros((Pb, Qb), jnp.float32)
                blocks.append(blk)
            dvals = jnp.concatenate(blocks, axis=0)  # [C*Pb, Qb]
            dt1 = jnp.dot(
                dvals.astype(jnp.bfloat16), rv_ref[0, 0],
                preferred_element_type=jnp.float32,
            )  # [C*Pb, nv]
            acc_ref[...] += dt1.reshape(C, Pb, nv)

        # ---- roll pending to this position's b-side; advance carries
        pend_ref[qb, 0] = d_b
        for c in range(3):
            pend_ref[qb, 1 + c] = m(tbar * dmraws[c])
        if with_diffuse:
            for c in range(3):
                pend_ref[qb, 4 + c] = m(tbar * ddmraws[c])
        carry_ref[qb, 0] = jnp.where(cell_on, T * (1.0 - alpha), T)
        carry_ref[qb, 1] = jnp.where(cell_on, S_prefix, carry_ref[qb, 1])

        # ---- store position values for the next cell
        prev_ref[qb, 0] = sig
        for c in range(3):
            prev_ref[qb, 1 + c] = rgb[c]
        if with_diffuse:
            for c in range(3):
                prev_ref[qb, 4 + c] = dif[c]
        prev_ref[qb, LROW] = livem

    return kernel, SROWS, NDM


def _composite_backward_qb(t1, rvt, ybasis, live_u, live_v, norm, geom, gaux,
                           statics, Pn, Qn, PB, Pb, QB, Qb, cell_live,
                           pos_needed):
    """q-split variant of _composite_backward (see _make_backward_kernel_qb).
    Q-wide operands carry a leading q-block axis so every in-kernel access is
    a leading-dim (untiled) index."""
    rv = jnp.swapaxes(rvt, 1, 2)
    NP = t1.shape[0]
    nv = t1.shape[3]
    C = _padded_channels(statics)
    kernel, SROWS, NDM = _make_backward_kernel_qb(
        NP, Pb, Qb, QB, nv, C, statics.ncoeff, statics.relu_sigma,
        statics.with_diffuse,
    )
    PROWS = _sprows(statics.with_diffuse)[1]
    last = NP - 1
    rvt_q = jnp.transpose(rvt.reshape(NP, nv, QB, Qb), (0, 2, 1, 3))
    rv_q = rv.reshape(NP, QB, Qb, nv)
    yb_q = jnp.transpose(
        ybasis.reshape(statics.ncoeff, Pn, QB, Qb), (2, 0, 1, 3)
    )
    lv_q = live_v.reshape(NP, QB, 1, Qb)
    norm_q = jnp.transpose(norm.reshape(Pn, QB, Qb), (1, 0, 2))
    gaux_q = jnp.transpose(
        gaux.reshape(SROWS + 2, Pn, QB, Qb), (2, 0, 1, 3)
    )
    return pl.pallas_call(
        kernel,
        grid=(PB, NP + 1, QB),
        in_specs=[
            pl.BlockSpec((NP, 8), lambda pb, t, qb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((PB, QB, NP), lambda pb, t, qb: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((PB, QB, NP), lambda pb, t, qb: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, C, Pb, nv),
                lambda pb, t, qb: (jnp.minimum(t, last), 0, pb, 0),
            ),
            pl.BlockSpec(
                (1, 1, nv, Qb),
                lambda pb, t, qb: (jnp.minimum(t, last), qb, 0, 0),
            ),
            # rv pairs with the dt1 OUTPUT position (j - 1), not the replayed
            # position j: iteration j folds position j-1's finished cotangent
            pl.BlockSpec(
                (1, 1, Qb, nv),
                lambda pb, t, qb: (jnp.maximum(t - 1, 0), qb, 0, 0),
            ),
            pl.BlockSpec((QB, statics.ncoeff, Pb, Qb),
                         lambda pb, t, qb: (0, 0, pb, 0)),
            pl.BlockSpec((1, Pb, 1),
                         lambda pb, t, qb: (jnp.minimum(t, last), pb, 0)),
            pl.BlockSpec(
                (1, 1, 1, Qb),
                lambda pb, t, qb: (jnp.minimum(t, last), qb, 0, 0),
            ),
            pl.BlockSpec((QB, Pb, Qb), lambda pb, t, qb: (0, pb, 0)),
            pl.BlockSpec((QB, SROWS + 2, Pb, Qb),
                         lambda pb, t, qb: (0, 0, pb, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, C, Pb, nv),
            lambda pb, t, qb: (jnp.maximum(t - 1, 0), 0, pb, 0),
        ),
        out_shape=jax.ShapeDtypeStruct((NP, C, Pn, nv), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((QB, PROWS, Pb, Qb), jnp.float32),
            pltpu.VMEM((QB, NDM, Pb, Qb), jnp.float32),
            pltpu.VMEM((QB, 2, Pb, Qb), jnp.float32),
            pltpu.VMEM((C, Pb, nv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=statics.interpret,
    )(geom, cell_live, pos_needed, t1, rvt_q, rv_q, yb_q, live_u, lv_q,
      norm_q, gaux_q)


def _composite_backward(t1, rvt, ybasis, live_u, live_v, norm, geom, gaux,
                        occupancy, statics, Pn, Qn, PB, Pb):
    from thr3ed_atom_tpu.rendering.gnomonic import _qb_blocks

    QB, Qb = _qb_blocks(statics, Qn)
    NP = t1.shape[0]
    if occupancy is None:
        shape = (PB, NP) if QB == 1 else (PB, QB, NP)
        cell_live = jnp.ones(shape, jnp.int32)
        pos_needed = jnp.ones(shape, jnp.int32)
    else:
        cell_live, pos_needed = occupancy
    if QB > 1:
        assert cell_live.shape == (PB, QB, NP), cell_live.shape
        return _composite_backward_qb(
            t1, rvt, ybasis, live_u, live_v, norm, geom, gaux, statics,
            Pn, Qn, PB, Pb, QB, Qb, cell_live, pos_needed,
        )
    rv = jnp.swapaxes(rvt, 1, 2)  # v-tents in dt1-contraction orientation
    nv = t1.shape[3]
    C = _padded_channels(statics)
    kernel, SROWS, NDM = _make_backward_kernel(
        NP, Pb, Qn, nv, C, statics.ncoeff, statics.relu_sigma,
        statics.with_diffuse,
    )
    PROWS = _sprows(statics.with_diffuse)[1]
    last = NP - 1
    return pl.pallas_call(
        kernel,
        grid=(PB, NP + 1),
        in_specs=[
            pl.BlockSpec((NP, 8), lambda pb, t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((PB, NP), lambda pb, t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((PB, NP), lambda pb, t: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, C, Pb, nv), lambda pb, t: (jnp.minimum(t, last), 0, pb, 0)
            ),
            pl.BlockSpec((1, nv, Qn), lambda pb, t: (jnp.minimum(t, last), 0, 0)),
            # rv pairs with the dt1 OUTPUT position (j - 1), not the replayed
            # position j: iteration j folds position j-1's finished cotangent
            pl.BlockSpec((1, Qn, nv), lambda pb, t: (jnp.maximum(t - 1, 0), 0, 0)),
            pl.BlockSpec((statics.ncoeff, Pb, Qn), lambda pb, t: (0, pb, 0)),
            pl.BlockSpec((1, Pb, 1), lambda pb, t: (jnp.minimum(t, last), pb, 0)),
            pl.BlockSpec((1, 1, Qn), lambda pb, t: (jnp.minimum(t, last), 0, 0)),
            pl.BlockSpec((Pb, Qn), lambda pb, t: (pb, 0)),
            pl.BlockSpec((SROWS + 2, Pb, Qn), lambda pb, t: (0, pb, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, C, Pb, nv), lambda pb, t: (jnp.maximum(t - 1, 0), 0, pb, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((NP, C, Pn, nv), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((PROWS, Pb, Qn), jnp.float32),
            pltpu.VMEM((NDM, Pb, Qn), jnp.float32),
            pltpu.VMEM((2, Pb, Qn), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=statics.interpret,
    )(geom, cell_live, pos_needed, t1, rvt, rv, ybasis, live_u, live_v, norm,
      gaux)


# ------------------------------------------------ fused (v3) backward kernel


def _make_backward_kernel_fused(NP, Pb, Qb, QB, PB, nu, nv, C, ncoeff,
                                relu_sigma, with_diffuse, P):
    """FUSED replay VJP: raw position slices in, dslices out — neither the t1
    values tensor nor its dt1 cotangent ever exist in HBM (the training-path
    port of gnomonic._make_composite_kernel_fused; round-4 deleted the same
    ~1 GB/pose round trip from the render path).

    grid=(NP + 1, PB, QB) — positions OUTERMOST (the v2 backward puts u-blocks
    outermost). That inversion is what makes the fusion work: the whole
    frame's march carries (T, inner prefix, previous-position rows, pending
    cotangent rows) persist in [PB, QB, rows, Pb, Qb] scratch, each raw slice
    block streams from HBM exactly once per position, and position j-1's
    dslices cotangent accumulates across (pb, qb) in an f32 scratch before a
    single flush — HBM traffic per pose drops from ~2x t1 + 2x dt1 (~4 GB at
    128^3/400px/P=2) to 2x slices (~0.5 GB).

    Per (j, pb, qb) step, tent weights are rebuilt in-kernel from the affine
    geom scalars (U = bu + ku*p, V = bv + kv*q): w_u for the replay resample
    at qb == 0 (one [Pb, nu] @ [nu, C*nv] MXU pass into t1m scratch), w_v for
    the replayed values, and the POSITION j-1 tents (w_v', w_u'T) for the two
    cotangent folds dvals -> dt1 -> dslices. Replay math is bit-identical to
    the fused forward (same dots, same operand roundings)."""
    SROWS, PROWS = _sprows(with_diffuse)
    LROW = PROWS - 1
    NDM = PROWS - 1  # pending rows: dsig + drgb*3 (+ ddif*3)

    def kernel(geom_ref, cl_ref, pn_ref, pa_ref, sl_a_ref, sl_b_ref, yb_ref,
               norm_ref, gaux_ref, dsl_ref, prev_ref, pend_ref, carry_ref,
               t1m_ref, dt1_ref, dslacc_ref):
        j = pl.program_id(0)
        pb = pl.program_id(1)
        qb = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            carry_ref[pb, qb, 0] = jnp.ones((Pb, Qb), jnp.float32)
            carry_ref[pb, qb, 1] = jnp.zeros((Pb, Qb), jnp.float32)
            pend_ref[pb, qb] = jnp.zeros((NDM, Pb, Qb), jnp.float32)

        @pl.when(qb == 0)
        def _():
            dt1_ref[...] = jnp.zeros_like(dt1_ref)

        @pl.when((pb == 0) & (qb == 0))
        def _():
            dslacc_ref[...] = jnp.zeros_like(dslacc_ref)

        jc = jnp.minimum(j, NP - 1)  # geom/flag rows are [NP]; j reaches NP
        jp = jnp.maximum(j - 1, 0)
        s_j = geom_ref[jc, 0]
        bu = geom_ref[jc, 2]
        ku = geom_ref[jc, 3]
        bv = geom_ref[jc, 4]
        kv = geom_ref[jc, 5]

        # ---- u-resample position jc's slice once (at the first q-block);
        # the slice is the in-VMEM lerp of its two VERTEX blocks — the same
        # _mix_vertex_slices the fused forward runs, so replay values are
        # bit-identical
        @pl.when((qb == 0) & (pa_ref[pb, jc] > 0))
        def _():
            sl = _mix_vertex_slices(sl_a_ref, sl_b_ref, jc, P)
            p_io = jax.lax.broadcasted_iota(jnp.int32, (Pb, nu), 0)
            u_io = jax.lax.broadcasted_iota(jnp.int32, (Pb, nu), 1)
            U = bu + ku * (p_io + pb * Pb).astype(jnp.float32)
            w_u = jnp.maximum(0.0, 1.0 - jnp.abs(U - u_io.astype(jnp.float32)))
            # store the raw [Pb, C*nv] result — all downstream consumers
            # slice vreg-column-aligned per-channel blocks (round-5: the 32
            # lane->sublane scatter copies are gone, matching the forward)
            t1m_ref[...] = jnp.dot(
                w_u.astype(jnp.bfloat16), sl,
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)  # [Pb, C*nv]

        live_replay = pn_ref[pb, qb, jc] > 0
        live_out = (j > 0) & (pn_ref[pb, qb, jp] > 0)
        work = live_replay | live_out

        @pl.when(jnp.logical_not(work))
        def _():
            # dead iteration: the pending rows must reflect cell j's (zero)
            # b-side contribution; dt1/dslacc keep other blocks' partials
            pend_ref[pb, qb] = jnp.zeros((NDM, Pb, Qb), jnp.float32)

        @pl.when(work)
        def _():
            _work_body(geom_ref, cl_ref, yb_ref, norm_ref, gaux_ref, prev_ref,
                       pend_ref, carry_ref, t1m_ref, dt1_ref, j, jc, pb, qb,
                       s_j, bu, ku, bv, kv)

        # ---- fold this u-block's completed dt1[j-1] into the dslices
        # accumulator through position j-1's u-tents (transposed build: the
        # [nu, Pb] orientation avoids any in-kernel transpose; dt1 is already
        # [Pb, C*nv], so the former dflat re-layout pass is gone)
        @pl.when((qb == QB - 1) & (j > 0) & (pa_ref[pb, jp] > 0))
        def _():
            u_io = jax.lax.broadcasted_iota(jnp.int32, (nu, Pb), 0)
            p_io = jax.lax.broadcasted_iota(jnp.int32, (nu, Pb), 1)
            Up = geom_ref[jp, 2] + geom_ref[jp, 3] * (
                p_io + pb * Pb
            ).astype(jnp.float32)
            w_uT = jnp.maximum(
                0.0, 1.0 - jnp.abs(Up - u_io.astype(jnp.float32))
            )
            dslacc_ref[...] += jnp.dot(
                w_uT.astype(jnp.bfloat16), dt1_ref[...].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )  # [nu, C*nv]

        @pl.when((j > 0) & (pb == PB - 1) & (qb == QB - 1))
        def _():
            dsl_ref[0] = dslacc_ref[...].astype(jnp.bfloat16)

    def _work_body(geom_ref, cl_ref, yb_ref, norm_ref, gaux_ref, prev_ref,
                   pend_ref, carry_ref, t1m_ref, dt1_ref, j, jc, pb, qb,
                   s_j, bu, ku, bv, kv):
        # ---- replay position jc (garbage-masked for j == NP and for stale
        # t1m at pa-dead positions — see the pa invariant in the v2 kernel)
        q_io = jax.lax.broadcasted_iota(jnp.int32, (nv, Qb), 1)
        v_io = jax.lax.broadcasted_iota(jnp.int32, (nv, Qb), 0)
        V = bv + kv * (q_io + qb * Qb).astype(jnp.float32)
        w_v = jnp.maximum(0.0, 1.0 - jnp.abs(V - v_io.astype(jnp.float32)))
        w_vb = w_v.astype(jnp.bfloat16)
        ch_cache = {}

        def ch_val(c):
            # per-channel v-resample [Pb, nv] @ [nv, Qb] on vreg-column-
            # aligned slices of the [Pb, C*nv] t1m (pad channels never dot)
            if c not in ch_cache:
                ch_cache[c] = jnp.dot(
                    t1m_ref[:, c * nv:(c + 1) * nv], w_vb,
                    preferred_element_type=jnp.float32,
                )
            return ch_cache[c]

        pq_p = jax.lax.broadcasted_iota(jnp.int32, (Pb, Qb), 0)
        pq_q = jax.lax.broadcasted_iota(jnp.int32, (Pb, Qb), 1)
        Up_l = bu + ku * (pq_p + pb * Pb).astype(jnp.float32)
        Vq_l = bv + kv * (pq_q + qb * Qb).astype(jnp.float32)
        livem = (
            (Up_l >= -0.5) & (Up_l <= nu - 0.5) & (s_j > 0.0)
            & (Vq_l >= -0.5) & (Vq_l <= nv - 0.5)
        ).astype(jnp.float32)
        sig = ch_val(3 * ncoeff)

        def fold(colour, coeffs):
            acc = yb_ref[pb, qb, 0] * ch_val(colour * ncoeff)
            for k in range(1, coeffs):
                acc += yb_ref[pb, qb, k] * ch_val(colour * ncoeff + k)
            return acc

        rgb = [fold(c, ncoeff) for c in range(3)]
        dif = [fold(c, 1) for c in range(3)] if with_diffuse else []

        cell_on = (j > 0) & (j < NP) & (cl_ref[pb, qb, jc] > 0)

        def m(x):  # mask with select (safe against garbage NaNs at j == 0 / NP)
            return jnp.where(cell_on, x, jnp.zeros_like(x))

        # ---- recompute cell j forward quantities (between positions j-1, j)
        sig_a = prev_ref[pb, qb, 0]
        live_pair = prev_ref[pb, qb, LROW] * livem
        integ_raw, tbar, dIda, dIdb = _relu_trap(sig_a, sig, relu_sigma)
        integ = integ_raw * live_pair
        cell_step = geom_ref[jc, 1]
        delta = cell_step * norm_ref[pb, qb]
        e = jnp.exp(-integ * delta)
        alpha = 1.0 - e
        T = carry_ref[pb, qb, 0]
        w = m(alpha * T)
        s_b = geom_ref[jc, 0]
        s_mid = (s_b - cell_step + tbar * cell_step) * norm_ref[pb, qb]
        tb1 = 1.0 - tbar

        g_col = [gaux_ref[pb, qb, 1 + c] for c in range(3)]
        g_acc = gaux_ref[pb, qb, 4]
        g_dep = gaux_ref[pb, qb, 5]
        g_dif = (
            [gaux_ref[pb, qb, 6 + c] for c in range(3)] if with_diffuse else []
        )
        g_T = gaux_ref[pb, qb, 0]
        S_total = gaux_ref[pb, qb, SROWS]
        T_fin = gaux_ref[pb, qb, SROWS + 1]

        mids = [
            jax.nn.sigmoid(tb1 * prev_ref[pb, qb, 1 + c] + tbar * rgb[c])
            for c in range(3)
        ]
        inner = g_acc + g_dep * s_mid
        for c in range(3):
            inner += g_col[c] * mids[c]
        if with_diffuse:
            dmids = [
                jax.nn.sigmoid(tb1 * prev_ref[pb, qb, 4 + c] + tbar * dif[c])
                for c in range(3)
            ]
            for c in range(3):
                inner += g_dif[c] * dmids[c]

        S_prefix = carry_ref[pb, qb, 1] + m(inner * w)
        suffix = (S_total - S_prefix) + g_T * T_fin
        # division-free dL/d(integral): delta * ((1-alpha) * T * inner - suffix).
        # every product is masked AFTER multiplication (0 * NaN from the
        # uninitialized j==0 prev scratch would otherwise leak)
        dinteg = delta * (e * T * inner - suffix) * live_pair
        d_a = m(dinteg * dIda)
        d_b = m(dinteg * dIdb)

        dmraws = [g_col[c] * w * mids[c] * (1.0 - mids[c]) for c in range(3)]
        if with_diffuse:
            ddmraws = [
                g_dif[c] * w * dmids[c] * (1.0 - dmids[c]) for c in range(3)
            ]

        # ---- accumulate this q-block's partial dt1 for position j-1
        # (pending b-side of cell j-1 + this cell's a-side), folded through
        # position j-1's v-tents built in the [Qb, nv] orientation
        @pl.when(j > 0)
        def _():
            dsig_prev = pend_ref[pb, qb, 0] + d_a
            drgb_prev = [
                pend_ref[pb, qb, 1 + c] + m(tb1 * dmraws[c]) for c in range(3)
            ]
            if with_diffuse:
                ddif_prev = [
                    pend_ref[pb, qb, 4 + c] + m(tb1 * ddmraws[c])
                    for c in range(3)
                ]
            jpp = jnp.maximum(j - 1, 0)
            q_io2 = jax.lax.broadcasted_iota(jnp.int32, (Qb, nv), 0)
            v_io2 = jax.lax.broadcasted_iota(jnp.int32, (Qb, nv), 1)
            Vp = geom_ref[jpp, 4] + geom_ref[jpp, 5] * (
                q_io2 + qb * Qb
            ).astype(jnp.float32)
            w_vp = jnp.maximum(
                0.0, 1.0 - jnp.abs(Vp - v_io2.astype(jnp.float32))
            ).astype(jnp.bfloat16)
            # per-channel dvals -> dt1 fold on the [Pb, C*nv] layout; the
            # C - (3*ncoeff + 1) pad channels never existed as blocks here
            # (their dt1 columns stay at the qb==0 zero-fill)
            for ch in range(3 * ncoeff + 1):
                if ch < 3 * ncoeff:
                    c, k = divmod(ch, ncoeff)
                    blk = yb_ref[pb, qb, k] * drgb_prev[c]
                    if with_diffuse and k == 0:
                        blk = blk + yb_ref[pb, qb, 0] * ddif_prev[c]
                else:
                    blk = dsig_prev
                dt1_ref[:, ch * nv:(ch + 1) * nv] += jnp.dot(
                    blk.astype(jnp.bfloat16), w_vp,
                    preferred_element_type=jnp.float32,
                )  # [Pb, nv]

        # ---- roll pending to this position's b-side; advance carries
        pend_ref[pb, qb, 0] = d_b
        for c in range(3):
            pend_ref[pb, qb, 1 + c] = m(tbar * dmraws[c])
        if with_diffuse:
            for c in range(3):
                pend_ref[pb, qb, 4 + c] = m(tbar * ddmraws[c])
        carry_ref[pb, qb, 0] = jnp.where(cell_on, T * (1.0 - alpha), T)
        carry_ref[pb, qb, 1] = jnp.where(cell_on, S_prefix, carry_ref[pb, qb, 1])

        # ---- store position values for the next cell
        prev_ref[pb, qb, 0] = sig
        for c in range(3):
            prev_ref[pb, qb, 1 + c] = rgb[c]
        if with_diffuse:
            for c in range(3):
                prev_ref[pb, qb, 4 + c] = dif[c]
        prev_ref[pb, qb, LROW] = livem

    return kernel, SROWS, PROWS


def _composite_backward_fused(slices, ybasis, norm, geom, gaux, occupancy,
                              statics, Pn, Qn, PB, Pb):
    """Run the fused replay VJP: [NP, nu, C, nv] bf16 PER-POSITION dslices out
    (see _make_backward_kernel_fused). ``slices`` is the VERTEX stack
    [nvert, nu, C, nv] — interior quadrature positions are lerped in VMEM,
    mirroring the fused forward; the position->vertex cotangent reduction
    happens in XLA in _cpf_bwd. ``occupancy`` is the 3-tuple from
    gnomonic_occupancy_lite."""
    from thr3ed_atom_tpu.rendering.gnomonic import _qb_blocks

    QB, Qb = _qb_blocks(statics, Qn)
    cell_live, pos_needed, pos_any = occupancy
    nvert, nu = slices.shape[0], slices.shape[1]
    nv = slices.shape[3]
    NP = _num_positions(statics)
    P = statics.pos_per_cell
    C = _padded_channels(statics)
    kernel, SROWS, PROWS = _make_backward_kernel_fused(
        NP, Pb, Qb, QB, PB, nu, nv, C, statics.ncoeff, statics.relu_sigma,
        statics.with_diffuse, P,
    )
    NDM = PROWS - 1
    ia, ib = _vertex_index_maps(P, nvert)
    slices2d = slices.reshape(nvert, nu, C * nv)
    # every Pn/Qn-wide operand reorganizes to [PB, QB, ..., Pb, Qb] so all
    # in-kernel accesses are leading-dim indices on VMEM-resident blocks
    yb_pq = jnp.transpose(
        ybasis.reshape(statics.ncoeff, PB, Pb, QB, Qb), (1, 3, 0, 2, 4)
    )
    norm_pq = jnp.transpose(norm.reshape(PB, Pb, QB, Qb), (0, 2, 1, 3))
    gaux_pq = jnp.transpose(
        gaux.reshape(SROWS + 2, PB, Pb, QB, Qb), (1, 3, 0, 2, 4)
    )
    dsl = pl.pallas_call(
        kernel,
        grid=(NP + 1, PB, QB),
        in_specs=[
            pl.BlockSpec((NP, 8), lambda t, pb, qb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((PB, QB, NP), lambda t, pb, qb: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((PB, QB, NP), lambda t, pb, qb: (0, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((PB, NP), lambda t, pb, qb: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, nu, C * nv),
                         lambda t, pb, qb: (ia(t), 0, 0)),
            pl.BlockSpec((1, nu, C * nv),
                         lambda t, pb, qb: (ib(t), 0, 0)),
            pl.BlockSpec((PB, QB, statics.ncoeff, Pb, Qb),
                         lambda t, pb, qb: (0, 0, 0, 0, 0)),
            pl.BlockSpec((PB, QB, Pb, Qb), lambda t, pb, qb: (0, 0, 0, 0)),
            pl.BlockSpec((PB, QB, SROWS + 2, Pb, Qb),
                         lambda t, pb, qb: (0, 0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, nu, C * nv), lambda t, pb, qb: (jnp.maximum(t - 1, 0), 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((NP, nu, C * nv), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((PB, QB, PROWS, Pb, Qb), jnp.float32),
            pltpu.VMEM((PB, QB, NDM, Pb, Qb), jnp.float32),
            pltpu.VMEM((PB, QB, 2, Pb, Qb), jnp.float32),
            pltpu.VMEM((Pb, C * nv), jnp.bfloat16),
            pltpu.VMEM((Pb, C * nv), jnp.float32),
            pltpu.VMEM((nu, C * nv), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
        interpret=statics.interpret,
    )(geom, cell_live, pos_needed, pos_any, slices2d, slices2d, yb_pq,
      norm_pq, gaux_pq)
    return dsl.reshape(NP, nu, C, nv)


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def composite_positions_fused_diff(slices, ybasis, norm, geom, cell_live,
                                   pos_needed, pos_any,
                                   statics: GnomonicStatics, Pn, Qn, PB, Pb):
    """composite_positions_fused with the fused replay VJP wrt slices (the
    only grid-dependent input). Forward and backward both run WITHOUT the t1
    values tensor or the Ru/RvT geometry tensors ever touching HBM."""
    from thr3ed_atom_tpu.rendering.gnomonic import composite_positions_fused

    return composite_positions_fused(
        slices, ybasis, norm, geom, statics, Pn, Qn, PB, Pb,
        (cell_live, pos_needed, pos_any),
    )


def _cpf_fwd(slices, ybasis, norm, geom, cell_live, pos_needed, pos_any,
             statics, Pn, Qn, PB, Pb):
    from thr3ed_atom_tpu.rendering.gnomonic import composite_positions_fused

    state = composite_positions_fused(
        slices, ybasis, norm, geom, statics, Pn, Qn, PB, Pb,
        (cell_live, pos_needed, pos_any),
    )
    return state, (slices, ybasis, norm, geom, cell_live, pos_needed,
                   pos_any, state)


def _cpf_bwd(statics, Pn, Qn, PB, Pb, res, gstate):
    (slices, ybasis, norm, geom, cell_live, pos_needed, pos_any, state) = res
    S_total = jnp.sum(gstate[1:] * state[1:], axis=0)
    gaux = jnp.concatenate([gstate, S_total[None], state[0:1]], axis=0)
    dpos = _composite_backward_fused(
        slices, ybasis, norm, geom, gaux, (cell_live, pos_needed, pos_any),
        statics, Pn, Qn, PB, Pb,
    )
    P = statics.pos_per_cell
    if P == 1:
        dslices = dpos
    else:
        # position -> vertex cotangent fold: position j = (1-f)*vert[j//P] +
        # f*vert[min(j//P+1, nvert-1)] with f = (j%P)/P, so dvert = W @ dpos
        # with the transposed lerp weights (2 nonzeros per column; every f is
        # a power-of-two multiple for P in {2,4,8}, so bf16 W is exact). One
        # MXU pass over the per-position cotangent, f32 accumulate.
        nvert = slices.shape[0]
        NP = dpos.shape[0]
        idx = np.arange(NP)
        f = (idx % P).astype(np.float32) / P
        W = np.zeros((nvert, NP), np.float32)
        np.add.at(W, (idx // P, idx), 1.0 - f)
        np.add.at(W, (np.minimum(idx // P + 1, nvert - 1), idx), f)
        dslices = jnp.einsum(
            "vj,jucw->vucw", jnp.asarray(W, jnp.bfloat16), dpos,
            preferred_element_type=jnp.float32,
        ).astype(slices.dtype)
    z = jnp.zeros_like
    return (dslices, z(ybasis), z(norm), z(geom), z(cell_live),
            z(pos_needed), z(pos_any))


composite_positions_fused_diff.defvjp(_cpf_fwd, _cpf_bwd)


# --------------------------------------------------------------- custom VJP


@partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def composite_positions_diff(t1, rvt, ybasis, live_u, live_v, norm, geom,
                             cell_live, pos_needed,
                             statics: GnomonicStatics, Pn, Qn, PB, Pb):
    """composite_positions with a hand-written replay VJP wrt t1 (the only
    grid-dependent input; every other operand is pose geometry). The
    (cell_live, pos_needed) occupancy flags gate both directions — exactly
    lossless (see gnomonic_occupancy)."""
    return composite_positions(
        t1, rvt, ybasis, live_u, live_v, norm, geom, statics, Pn, Qn, PB, Pb,
        occupancy=(cell_live, pos_needed),
    )


def _cp_fwd(t1, rvt, ybasis, live_u, live_v, norm, geom, cell_live,
            pos_needed, statics, Pn, Qn, PB, Pb):
    state = composite_positions(
        t1, rvt, ybasis, live_u, live_v, norm, geom, statics, Pn, Qn, PB, Pb,
        occupancy=(cell_live, pos_needed),
    )
    return state, (t1, rvt, ybasis, live_u, live_v, norm, geom, cell_live,
                   pos_needed, state)


def _cp_bwd(statics, Pn, Qn, PB, Pb, res, gstate):
    (t1, rvt, ybasis, live_u, live_v, norm, geom, cell_live, pos_needed,
     state) = res
    # S_total = sum_k G_k w_k over every payload row (colour, acc, depth,
    # diffuse) — an elementwise inner product of the forward output with its
    # cotangent, per texel
    S_total = jnp.sum(gstate[1:] * state[1:], axis=0)
    gaux = jnp.concatenate([gstate, S_total[None], state[0:1]], axis=0)
    dt1 = _composite_backward(
        t1, rvt, ybasis, live_u, live_v, norm, geom, gaux,
        (cell_live, pos_needed), statics, Pn, Qn, PB, Pb,
    )
    z = jnp.zeros_like
    return (dt1, z(rvt), z(ybasis), z(live_u), z(live_v), z(norm),
            z(geom), z(cell_live), z(pos_needed))


composite_positions_diff.defvjp(_cp_fwd, _cp_bwd)


# --------------------------------------------------------------- train step


class GnomonicTrainStatics(NamedTuple):
    """Hashable statics of one compiled gnomonic train-step program (one per
    march-axis variant per stage)."""

    statics: GnomonicStatics
    height: int
    width: int
    supersample: float
    white_bkgd: bool
    apply_diffuse_render_regularization: bool
    frame: Tuple[int, int, int, int]  # Pn, Qn, PB, Pb
    warp_order: int = 3
    # warp implementation + pass order (see rendering/warp_matmul.py); the
    # swap flag is a per-pose host decision — the trainer buckets poses by
    # (axis, flip, swap) so each compiled step program has a fixed value
    warp_impl: str = "gather"
    warp_swap: bool = False
    # fused (v3) pipeline: raw slices -> in-kernel u-resample -> composite,
    # replay VJP emits dslices directly — no t1/dt1 HBM tensors either way.
    # Chosen at statics construction (fused_train_frame); False falls back to
    # the v2 (separate u-resample einsum + per-u-block backward) pipeline.
    fused: bool = False


def make_gnomonic_train_statics(
    voxel_grid: VoxelGrid,
    axis: int,
    flip: bool,
    *,
    image_height: int,
    image_width: int,
    white_bkgd: bool,
    apply_diffuse_render_regularization: bool = True,
    pos_per_cell: int = 0,
    supersample: float = 1.25,
    warp_order: int = 3,
    interpret: bool = False,
    qb: int = 0,
    warp_impl: str = "auto",
    warp_swap: bool = False,
    fused: Optional[bool] = None,
) -> GnomonicTrainStatics:
    from thr3ed_atom_tpu.rendering.gnomonic import effective_supersample

    statics = statics_for_grid(
        voxel_grid, axis, flip,
        with_diffuse=apply_diffuse_render_regularization,
        pos_per_cell=pos_per_cell, interpret=interpret, qb=qb,
    )
    supersample = effective_supersample(
        float(supersample), statics, image_height, image_width
    )
    fused_frame = None
    if fused is not False:  # None = auto, True = require
        fused_frame = fused_train_frame(image_height, image_width,
                                        supersample, statics)
        if fused and fused_frame is None:
            raise ValueError(
                "fused gnomonic training requires qb > 0, a lane-aligned "
                "grid (nv % 128 == 0) and a frame whose carries fit VMEM"
            )
    if fused_frame is not None:
        frame, fused = fused_frame, True
    else:
        frame = gnomonic_frame_train(image_height, image_width, supersample,
                                     statics)
        fused = False
    if warp_impl == "auto":
        warp_impl = "matmul"
    return GnomonicTrainStatics(
        statics=statics,
        height=int(image_height),
        width=int(image_width),
        supersample=float(supersample),
        white_bkgd=bool(white_bkgd),
        apply_diffuse_render_regularization=bool(
            apply_diffuse_render_regularization
        ),
        frame=frame,
        warp_order=int(warp_order),
        warp_impl=str(warp_impl),
        warp_swap=bool(warp_swap),
        fused=fused,
    )


def render_pose_from_slices(slices, rotation, origin, focal,
                            tstat: GnomonicTrainStatics, key=None):
    """Differentiable whole-pose render from already-repacked position slices
    (bf16 or f32 — f32 inputs are cast to bf16 here, bit-identical to the
    repack rounding its own output). The multi-pose train step hoists one
    repack out of its pose scan and calls this per pose.

    Contract: ``slices`` must be repacked with ``vertex_only=tstat.fused`` —
    the fused (v3) pipeline consumes the VERTEX stack and lerps interior
    quadrature positions in VMEM; the v2 pipeline consumes the full
    interleaved position stack."""
    statics = tstat.statics
    Pn, Qn, PB, Pb = tstat.frame
    phase = None
    if key is not None:
        phase = tuple(jax.random.uniform(key, (2,), minval=-0.5, maxval=0.5))
    from thr3ed_atom_tpu.rendering.gnomonic import (
        _qb_blocks,
        gnomonic_occupancy_lite,
    )

    slices = slices.astype(jnp.bfloat16)
    if tstat.fused:
        # fused (v3) pipeline: no t1/Ru/RvT tensors in HBM either direction
        geo = jax.lax.stop_gradient(
            gnomonic_geometry(
                rotation, origin, statics, tstat.height, tstat.width, focal,
                tstat.supersample, frame=(Pn, Qn), phase=phase, lite=True,
            )
        )
        QB, Qb = _qb_blocks(statics, Qn)
        occupancy = jax.lax.stop_gradient(
            gnomonic_occupancy_lite(slices, geo.geom, statics, Pn, Qn, PB,
                                    Pb, QB, Qb)
        )
        state = composite_positions_fused_diff(
            slices, geo.ybasis, geo.norm, geo.geom, *occupancy,
            statics, Pn, Qn, PB, Pb,
        )
        return _warp_to_camera(
            state, geo.xr, geo.yr, rotation, statics, tstat.height,
            tstat.width, focal, tstat.supersample, tstat.white_bkgd,
            frame=(Pn, Qn), warp_order=tstat.warp_order,
            warp_impl=tstat.warp_impl, warp_swap=tstat.warp_swap,
        )
    geo = jax.lax.stop_gradient(
        gnomonic_geometry(
            rotation, origin, statics, tstat.height, tstat.width, focal,
            tstat.supersample, frame=(Pn, Qn), phase=phase,
        )
    )
    t1 = resample_u(slices, geo.Ru)
    QB, _Qb = _qb_blocks(statics, Qn)
    cell_live, pos_needed = jax.lax.stop_gradient(
        gnomonic_occupancy(slices, geo.Ru, statics, PB, Pb,
                           RvT=geo.RvT if QB > 1 else None, QB=QB)
    )
    state = composite_positions_diff(
        t1, geo.RvT, geo.ybasis, geo.live_u, geo.live_v, geo.norm,
        geo.geom, cell_live, pos_needed, statics, Pn, Qn, PB, Pb,
    )
    return _warp_to_camera(
        state, geo.xr, geo.yr, rotation, statics, tstat.height, tstat.width,
        focal, tstat.supersample, tstat.white_bkgd, frame=(Pn, Qn),
        warp_order=tstat.warp_order, warp_impl=tstat.warp_impl,
        warp_swap=tstat.warp_swap,
    )


def render_pose_diff(voxel_grid: VoxelGrid, rotation, origin, focal,
                     tstat: GnomonicTrainStatics, key=None):
    """Differentiable whole-pose render through the gnomonic pipeline.
    Returns the warped RenderOut (colour [H, W, 3] + extra). ``key`` enables
    per-step sub-texel phase jitter of the resample frame (unbiased — the
    warp compensates exactly; the gnomonic analogue of the reference's
    perturb_sampled_points)."""
    slices = repack_position_slices(voxel_grid, tstat.statics,
                                    vertex_only=tstat.fused)
    return render_pose_from_slices(slices, rotation, origin, focal, tstat,
                                   key=key)


def _pose_loss_from_slices(tstat: GnomonicTrainStatics, slices, image,
                           rotation, origin, focal, key=None):
    """Whole-pose objective on pre-repacked slices (same as the reference
    trainer: specular L1 + optional diffuse L1 regularization,
    trainers.py:311-330)."""
    out = render_pose_from_slices(slices, rotation, origin, focal, tstat,
                                  key=key)
    colour = out.colour
    specular_loss = jnp.mean(jnp.abs(colour - image))
    specular_mse = jnp.mean((colour - image) ** 2)
    total = specular_loss
    aux = {
        "specular_loss": specular_loss,
        "specular_psnr": mse2psnr(specular_mse),
    }
    if tstat.apply_diffuse_render_regularization:
        diffuse = out.extra[EXTRA_DIFFUSE_COLOUR]
        diffuse_loss = jnp.mean(jnp.abs(diffuse - image))
        diffuse_mse = jnp.mean((diffuse - image) ** 2)
        total = total + diffuse_loss
        aux |= {
            "diffuse_loss": diffuse_loss,
            "diffuse_psnr": mse2psnr(diffuse_mse),
        }
    aux["total_loss"] = total
    return total, aux


def _pose_loss(tstat: GnomonicTrainStatics, g: VoxelGrid, image, rotation,
               origin, focal, key=None):
    """Whole-pose objective on the grid (repack + _pose_loss_from_slices)."""
    slices = repack_position_slices(g, tstat.statics,
                                    vertex_only=tstat.fused)
    return _pose_loss_from_slices(tstat, slices, image, rotation, origin,
                                  focal, key)


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3))
def gnomonic_train_step(
    tstat: GnomonicTrainStatics,
    tx: optax.GradientTransformation,
    grid: VoxelGrid,
    opt_state,
    image: jnp.ndarray,  # [H, W, 3] f32 ground-truth pixels
    rotation: jnp.ndarray,  # [3, 3]
    origin: jnp.ndarray,  # [3]
    focal: jnp.ndarray,  # scalar
    key=None,  # optional: per-step sub-texel phase jitter
):
    """One whole-pose optimization step."""
    (_loss, metrics), grads = jax.value_and_grad(
        partial(_pose_loss, tstat), has_aux=True
    )(grid, image, rotation, origin, focal, key)
    updates, opt_state = tx.update(grads, opt_state, grid)
    grid = optax.apply_updates(grid, updates)
    return grid, opt_state, metrics


@partial(jax.jit, static_argnums=(0, 1), donate_argnums=(2, 3))
def gnomonic_train_step_multi(
    tstat: GnomonicTrainStatics,
    tx: optax.GradientTransformation,
    grid: VoxelGrid,
    opt_state,
    images: jnp.ndarray,  # [k, H, W, 3] k training views (same march variant)
    rotations: jnp.ndarray,  # [k, 3, 3]
    origins: jnp.ndarray,  # [k, 3]
    focal: jnp.ndarray,  # scalar
    key=None,  # optional: per-pose sub-texel phase jitter
):
    """One optimization step on the AVERAGED gradient of k whole-pose losses
    (sequential lax.scan accumulation — one pipeline's activations live at a
    time, so HBM stays at the single-pose footprint). Decouples rays-per-step
    from the image size: at small training resolutions a single pose is far
    fewer rays than the ray-batch trainers' 32K default, which starves the
    whole-pose trainer in equal-iteration comparisons (reference
    trainers.py:271-341 samples rays across all views every step).

    The repack is HOISTED out of the pose scan: all k poses share one march
    variant, so the slices depend only on the grid — one repack forward and
    ONE repack VJP on the f32-accumulated slice cotangent replace k of each
    (repack fwd+VJP is the largest single step cost at production scale).
    Exactly equal to the per-pose form by linearity of the repack VJP in its
    cotangent (the repack stays un-rounded f32 at the VJP boundary; the
    per-pose bf16 cast happens inside render_pose_from_slices, bit-identical
    to the rounded repack).

    Memory: at large grids the f32 slices (2 GiB at 256^3) + the f32 grad
    carry + a per-pose f32 cotangent tip the step over HBM alongside the
    grid + Adam moments. Above _BF16_SLICES_BYTES the scan therefore runs on
    bf16 slices — forward bit-identical (the renderer casts to bf16 anyway);
    the per-pose slice cotangent then arrives bf16 (one extra rounding on a
    signal the composite kernel's backward already flushes to bf16) while the
    k-pose SUM still accumulates in f32 and reaches the repack VJP un-rounded."""
    grads, metrics = _multi_pose_grads(
        tstat, grid, images, rotations, origins, focal, key
    )
    updates, opt_state = tx.update(grads, opt_state, grid)
    grid = optax.apply_updates(grid, updates)
    return grid, opt_state, metrics


def _multi_pose_grads(tstat: GnomonicTrainStatics, grid, images, rotations,
                      origins, focal, key):
    """AVERAGED (grads, metrics) of k whole-pose losses with the hoisted
    repack (see gnomonic_train_step_multi's docstring) — shared by the
    single-device multi-pose step and the per-device body of the mesh step."""
    k = images.shape[0]
    slices_f32, repack_vjp = jax.vjp(
        lambda g: repack_position_slices(g, tstat.statics,
                                         round_output=False,
                                         vertex_only=tstat.fused),
        grid,
    )
    big = slices_f32.size * slices_f32.dtype.itemsize > _BF16_SLICES_BYTES
    slices_in = slices_f32.astype(jnp.bfloat16) if big else slices_f32
    grad_fn = jax.value_and_grad(
        partial(_pose_loss_from_slices, tstat), has_aux=True
    )
    keys = None if key is None else jax.random.split(key, k)

    def body(acc, xs):
        img, rot, org, kk = xs
        (_loss, aux), dsl = grad_fn(slices_in, img, rot, org, focal, kk)
        # promote-on-add keeps the carry f32 even when dsl is bf16
        return jax.tree_util.tree_map(
            lambda a, d: a + d.astype(a.dtype), acc, (dsl, aux)
        ), None

    # zeros-initialized carry (shapes via eval_shape — no tracing cost) so the
    # compiled program contains ONE copy of the whole-pose fwd+bwd pipeline
    (_ls, aux_s), dsl_s = jax.eval_shape(
        grad_fn, slices_in, images[0], rotations[0], origins[0], focal,
        None if keys is None else keys[0],
    )
    zero = jax.tree_util.tree_map(
        lambda s: jnp.zeros(
            s.shape, jnp.float32 if s.dtype == jnp.bfloat16 else s.dtype
        ),
        (dsl_s, aux_s),
    )
    (dslsum, auxsum), _ = jax.lax.scan(
        body, zero, (images, rotations, origins, keys)
    )
    (grads,) = repack_vjp(dslsum / k)
    metrics = {k_: v / k for k_, v in auxsum.items()}
    return grads, metrics


@partial(jax.jit, static_argnums=(0, 1, 2), donate_argnums=(3, 4))
def gnomonic_train_step_mesh(
    tstat: GnomonicTrainStatics,
    tx: optax.GradientTransformation,
    n_dev: int,
    grid: VoxelGrid,
    opt_state,
    images: jnp.ndarray,  # [n_dev, k, H, W, 3] k training views per device
    rotations: jnp.ndarray,  # [n_dev, k, 3, 3] (all the SAME (axis, flip) variant)
    origins: jnp.ndarray,  # [n_dev, k, 3]
    focal: jnp.ndarray,  # scalar
    key=None,  # optional: per-pose sub-texel phase jitter
):
    """Pose-parallel gnomonic step over a "data" mesh: each device renders and
    differentiates k whole training views (sequential scan with the hoisted
    repack, exactly the single-device multi-pose step); gradients and metrics
    psum-average over the mesh, so one step averages n_dev * k whole-pose
    gradients. k > 1 keeps the per-step view-diversity floor
    (modules/trainer._GN_MIN_POSES_PER_STEP) satisfied on meshes narrower than
    the floor — single-view steps at the canonical lr measurably thrash the
    grid (round-4 canonical run: stage-3 heldout 44.9 -> 31.1 dB). All poses
    of a step must share the march (axis, flip) variant (the trainer buckets
    views by dominant_axis_for_pose)."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.array(jax.devices()[:n_dev]), axis_names=("data",))

    def device_fn(g, img, rot, org, foc):
        kk = None
        if key is not None:
            kk = jax.random.fold_in(key, jax.lax.axis_index("data"))
        grads, aux = _multi_pose_grads(
            tstat, g, img[0], rot[0], org[0], foc, kk
        )
        grads = jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, "data") / n_dev, grads
        )
        aux = {k: jax.lax.psum(v, "data") / n_dev for k, v in aux.items()}
        return grads, aux

    grads, metrics = shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(grid, images, rotations, origins, focal)
    updates, opt_state = tx.update(grads, opt_state, grid)
    grid = optax.apply_updates(grid, updates)
    return grid, opt_state, metrics
