"""Two-pass scanline-matmul projective warp (Catmull-Smith on the MXU).

The gnomonic pipeline's final step resamples the composited texel image at the
real camera's pixels — a plane-at-infinity homography (gnomonic.py step 4).
The gather formulation costs 4 (bilinear) / 16 (Catmull-Rom) HBM gathers per
pixel and measured 3.6 / 13.2 ms per 400x400 pose on this chip — the single
largest render stage, and its scatter-add adjoint dominates the training
backward. This module replaces it with the classic two-pass decomposition
(Catmull & Smith 1980), which maps exactly onto TPU matmuls:

  A homography maps image ROWS to LINES in texel space, so for output row r
  the needed samples satisfy q = alpha_r + beta_r * p. Pass A resamples each
  texel column stack along q at those line positions, producing I[p, r]; pass
  B resamples I along p at p(r, c) (projective in c). Each pass is a 1-D
  resample per scanline whose weights form a small dense matrix -> one
  [CH, K] @ [K, N] matmul per scanline, built on the fly in VMEM (the full
  weight tensor would be ~100M elements — never materialized in HBM). Zero
  gathers; the adjoint is the same kernels with a transposed contraction
  (lax.dot_general over the output axis), so training costs two more matmul
  passes instead of a scatter-add.

Exactness: the two 1-D interpolations compose to a tensor-product
reconstruction along the sheared axes — the same approximation order as the
2-D gather kernels (exact on per-axis polynomials of the kernel's degree).
When an output row is nearly PARALLEL to the q axis (a strongly rolled
camera), the line's p-parametrization degenerates; ``warp_swap_for_pose``
detects this per pose (host-side, static) and the passes swap axes.

Replaces the same reference semantics as gnomonic._warp_to_camera: the final
image-space resample of the composited render (the reference renders per-ray
and needs no warp; this is TPU-architecture-specific machinery).
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from thr3ed_atom_tpu.rendering.bricked import _uv_axes

_ROWS_PER_BLOCK = 8


def _kernel_weights(t: jnp.ndarray, order: int) -> jnp.ndarray:
    """1-D reconstruction kernel K(t); support <= 2 texels each side."""
    at = jnp.abs(t)
    if order == 1:
        return jnp.maximum(0.0, 1.0 - at)
    if order == 3:  # Catmull-Rom
        inner = (1.5 * at - 2.5) * at * at + 1.0
        outer = ((-0.5 * at + 2.5) * at - 4.0) * at + 2.0
        return jnp.where(at < 1.0, inner, jnp.where(at < 2.0, outer, 0.0))
    if order == 5:  # cubic B-spline (positions must be prefiltered coeffs)
        inner = (4.0 - 6.0 * at * at + 3.0 * at * at * at) / 6.0
        o2 = 2.0 - at
        outer = o2 * o2 * o2 / 6.0
        return jnp.where(at < 1.0, inner, jnp.where(at < 2.0, outer, 0.0))
    raise ValueError(f"unsupported warp order {order}")


_SEG = 128


def _make_resample_kernel(CH: int, K: int, N: int, order: int, adjoint: bool,
                          taps: bool):
    """Banded, liveness-gated resample (round-5 restructure).

    The weight matrix W_i[k, n] = K(k - pos[i, n]) is BANDED — the kernel
    support is <= 4 texels — but was built dense [K, N] on the VPU, and that
    build (not the matmul pass count) measured as the warp's bottleneck
    (DESIGN_NOTES round-5). Both axes are now chunked into 128-blocks and an
    XLA-precomputed SMEM mask gates each (n-chunk, k-chunk) pair on
    band-intersection AND nonzero-source: out-of-band blocks (most of them —
    a 128-output chunk's positions span ~1/4 of K) and empty source blocks
    (most of a composited frame is background, which is exactly zero before
    the white background is applied) skip the weight build and the dot
    entirely. Dead output chunks stay at their zero initialization, which is
    exact.

    Forward grid (b, nseg, kseg), kseg innermost: the [8, CH, 128] output
    chunk at (b, nseg) accumulates live k-segment dots. ``taps`` adds two
    one-hot rows extracting the CENTRAL taps (floor(pos), floor(pos)+1) into
    output planes 1 and 2 of a [8, 3, CH, 128] chunk — the wrapper clamps
    the cubic interpolant (plane 0) to their hull (the matmul analogue of
    the gather path's ringing clamp). Adjoint grid (b, kseg, nseg), nseg
    innermost: dX[i] = dY[i] (contract n) W_i — the same banded weight build
    with the contraction on the OUTPUT axis (lax.dot_general), no in-kernel
    transpose."""

    def kernel(x_ref, pos_ref, live_ref, o_ref):
        if adjoint:
            kseg = pl.program_id(1)
            nseg = pl.program_id(2)
            inner = nseg
        else:
            nseg = pl.program_id(1)
            kseg = pl.program_id(2)
            inner = kseg

        @pl.when(inner == 0)
        def _():
            o_ref[...] = jnp.zeros(o_ref.shape, o_ref.dtype)

        @pl.when(live_ref[0, nseg, kseg] > 0)
        def _():
            kio = jax.lax.broadcasted_iota(jnp.int32, (_SEG, _SEG), 0)
            kf = (kseg * _SEG + kio).astype(jnp.float32)
            for i in range(_ROWS_PER_BLOCK):
                posr = pos_ref[i, :, pl.ds(nseg * _SEG, _SEG)]  # [1, SEG]
                w = _kernel_weights(kf - posr, order)
                # Precision notes (round 4): these are f32 value x f32 weight
                # matmuls. The MXU's default single-pass mode quantizes BOTH
                # operands to bf16, turning the interpolation weights into
                # ~3-digit numbers — measured as an ss-INDEPENDENT ~55 dB
                # quality ceiling on the whole render while the f32 gather
                # warp reached 79 dB. HIGHEST (the multi-pass f32 algorithm;
                # Mosaic rejects HIGH) restores the interpolant. The
                # central-tap extractions feed only the ringing clamp's
                # bounds; one-hot weights are exact in bf16, so those dots
                # stay single-pass.
                if adjoint:
                    if taps:
                        p0 = jnp.floor(posr)
                        dy = x_ref[i, 0, :, pl.ds(nseg * _SEG, _SEG)]
                        acc = jax.lax.dot_general(
                            dy, w, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )
                        for t, oh in (
                            (1, (kf == p0).astype(jnp.float32)),
                            (2, (kf == p0 + 1.0).astype(jnp.float32)),
                        ):
                            acc += jax.lax.dot_general(
                                x_ref[i, t, :, pl.ds(nseg * _SEG, _SEG)], oh,
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                    else:
                        acc = jax.lax.dot_general(
                            x_ref[i, :, pl.ds(nseg * _SEG, _SEG)], w,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.HIGHEST,
                        )
                    o_ref[i] += acc
                else:
                    xseg = x_ref[i, :, pl.ds(kseg * _SEG, _SEG)]  # [CH, SEG]
                    y = jnp.dot(
                        xseg, w, preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )
                    if taps:
                        o_ref[i, 0] += y
                        p0 = jnp.floor(posr)
                        o_ref[i, 1] += jnp.dot(
                            xseg, (kf == p0).astype(jnp.float32),
                            preferred_element_type=jnp.float32,
                        )
                        o_ref[i, 2] += jnp.dot(
                            xseg, (kf == p0 + 1.0).astype(jnp.float32),
                            preferred_element_type=jnp.float32,
                        )
                    else:
                        o_ref[i] += y

    return kernel


def _band_masks(X, pos, order: int, adjoint: bool, K_out: int):
    """[NBB, NSEG, KSEG] int32 liveness: kernel-band intersection AND
    nonzero-source, OR-ed over the 8 scanlines of each row block. Skipping a
    zero source block is exact in both directions (forward: contributes
    nothing; adjoint: zero cotangent chunks contribute nothing to dX)."""
    NB = X.shape[0]
    N = pos.shape[2]
    NBB = NB // _ROWS_PER_BLOCK
    NSEG = N // _SEG
    half = 1.0 if order == 1 else 2.0
    pg = pos.reshape(NBB, _ROWS_PER_BLOCK, NSEG, _SEG)
    lo = jnp.floor(pg.min(axis=(1, 3))) - half          # [NBB, NSEG]
    hi = jnp.ceil(pg.max(axis=(1, 3))) + half
    if adjoint:
        KSEG = K_out // _SEG
        # source here is the cotangent dY [NB, (3,) CH, N] — chunk over N
        a = jnp.abs(X).reshape(NBB, -1, NSEG, _SEG)
        src = (a.max(axis=(1, 3)) > 0.0)                # [NBB, NSEG]
        src = src[:, :, None]
    else:
        KSEG = X.shape[-1] // _SEG
        a = jnp.abs(X).reshape(NBB, -1, KSEG, _SEG)
        src = (a.max(axis=(1, 3)) > 0.0)                # [NBB, KSEG]
        src = src[:, None, :]
    ks = jnp.arange(KSEG, dtype=jnp.float32) * _SEG
    band = (ks[None, None, :] <= hi[:, :, None]) & (
        ks[None, None, :] + (_SEG - 1) >= lo[:, :, None]
    )
    return (band & src).astype(jnp.int32)


def _resample_call(X, pos, order: int, adjoint: bool, K_out: int,
                   interpret: bool, taps: bool = False):
    if taps and adjoint:
        NB, three, CH, Nx = X.shape
        assert three == 3
    else:
        NB, CH, Nx = X.shape
    N = pos.shape[2]
    assert pos.shape == (NB, 1, N) and NB % _ROWS_PER_BLOCK == 0
    assert N % _SEG == 0, N
    if adjoint:
        assert Nx == N and K_out % _SEG == 0, (Nx, N, K_out)
        Kin, out_n = N, K_out
        KSEG = K_out // _SEG
    else:
        assert Nx % _SEG == 0, Nx
        Kin, out_n = Nx, N
        KSEG = Nx // _SEG
    NSEG = N // _SEG
    NBB = NB // _ROWS_PER_BLOCK
    live = _band_masks(X, pos, order, adjoint, K_out)
    kernel = _make_resample_kernel(CH, Kin, N, order, adjoint, taps)
    if adjoint:
        grid = (NBB, KSEG, NSEG)  # nseg innermost: accumulate over n-chunks
        x_block = ((_ROWS_PER_BLOCK, 3, CH, N) if taps
                   else (_ROWS_PER_BLOCK, CH, N))
        x_map = ((lambda b, k, n: (b, 0, 0, 0)) if taps
                 else (lambda b, k, n: (b, 0, 0)))
        pos_map = lambda b, k, n: (b, 0, 0)  # noqa: E731
        live_map = lambda b, k, n: (b, 0, 0)  # noqa: E731
        out_specs = pl.BlockSpec((_ROWS_PER_BLOCK, CH, _SEG),
                                 lambda b, k, n: (b, 0, k))
        out_shape = jax.ShapeDtypeStruct((NB, CH, out_n), jnp.float32)
    else:
        grid = (NBB, NSEG, KSEG)  # kseg innermost: accumulate over k-chunks
        x_block = (_ROWS_PER_BLOCK, CH, Kin)
        x_map = lambda b, n, k: (b, 0, 0)  # noqa: E731
        pos_map = lambda b, n, k: (b, 0, 0)  # noqa: E731
        live_map = lambda b, n, k: (b, 0, 0)  # noqa: E731
        if taps:
            out_specs = pl.BlockSpec((_ROWS_PER_BLOCK, 3, CH, _SEG),
                                     lambda b, n, k: (b, 0, 0, n))
            out_shape = jax.ShapeDtypeStruct((NB, 3, CH, N), jnp.float32)
        else:
            out_specs = pl.BlockSpec((_ROWS_PER_BLOCK, CH, _SEG),
                                     lambda b, n, k: (b, 0, n))
            out_shape = jax.ShapeDtypeStruct((NB, CH, N), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(x_block, x_map),
            pl.BlockSpec((_ROWS_PER_BLOCK, 1, N), pos_map),
            pl.BlockSpec((1, NSEG, KSEG), live_map,
                         memory_space=pltpu.SMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(X, pos, live)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def resample_rows(X, pos, order: int, interpret: bool = False,
                  taps: bool = False):
    """Row-batched 1-D resample: out[i] = X[i] @ W(pos[i]).

    X [NB, CH, K] f32, pos [NB, 1, N] f32 (positions in texel units, already
    clipped so the kernel support stays in range) -> [NB, CH, N] f32
    (``taps``: [NB, 3, CH, N] — plane 0 the interpolant, planes 1/2 the two
    central tap values). K and N must be 128-multiples (the banded kernel's
    chunk size; every caller's frame is 128-rounded). Linear in X; the VJP
    runs the adjoint kernel (transposed contraction)."""
    return _resample_call(X, pos, order, adjoint=False, K_out=0,
                          interpret=interpret, taps=taps)


def _resample_fwd(X, pos, order, interpret, taps):
    return (
        _resample_call(X, pos, order, adjoint=False, K_out=0,
                       interpret=interpret, taps=taps),
        (pos, X.shape[2]),
    )


def _resample_bwd(order, interpret, taps, res, dY):
    pos, K = res
    dX = _resample_call(dY, pos, order, adjoint=True, K_out=K,
                        interpret=interpret, taps=taps)
    return dX, jnp.zeros_like(pos)


resample_rows.defvjp(_resample_fwd, _resample_bwd)


def resample_rows_clamped(X, pos, order: int, interpret: bool = False):
    """resample_rows + the ringing clamp: the cubic interpolant is clipped to
    the hull of its two central taps (per pass — composing both passes bounds
    the output by the local 2x2 neighbourhood, so empty regions stay EXACTLY
    empty and the white-background identity holds, mirroring the gather
    path's bilinear-hull clamp). The clip lives in XLA, so autodiff routes
    gradients through the active bound — the pallas op itself stays linear."""
    y3 = resample_rows(X, pos, order, interpret, True)
    y, t0, t1 = y3[:, 0], y3[:, 1], y3[:, 2]
    return jnp.clip(y, jnp.minimum(t0, t1), jnp.maximum(t0, t1))


# ------------------------------------------------------------------ geometry


def _homography_coeffs(rotation, statics, xr, yr, Pn: int, Qn: int, focal):
    """Coefficient triples of p, q and the shared denominator as affine
    functions of the CAMERA-PLANE coordinates (cx, cy):
    p = (P0 cx + P1 cy + P2) / (D0 cx + D1 cy + D2), q likewise."""
    axis = statics.axis
    u_ax, v_ax = _uv_axes(axis)
    g = -1.0 if statics.flip else 1.0
    x0, x1 = xr
    y0, y1 = yr
    sp = (Pn - 1) / (x1 - x0)
    sq = (Qn - 1) / (y1 - y0)
    Ru = [rotation[u_ax, 0], rotation[u_ax, 1], -rotation[u_ax, 2]]
    Rv = [rotation[v_ax, 0], rotation[v_ax, 1], -rotation[v_ax, 2]]
    Ra = [rotation[axis, 0], rotation[axis, 1], -rotation[axis, 2]]
    P = [sp * (g * Ru[i] - x0 * Ra[i]) for i in range(3)]
    Q = [sq * (g * Rv[i] - y0 * Ra[i]) for i in range(3)]
    return P, Q, Ra


def _row_coeffs(P, Q, D, H: int, W: int, Hp: int, focal):
    """Per-image-row coefficients: positions along row r as a projective
    function of the column c, plus the (alpha, beta) line parameters of the
    row's image in (p, q) texel space. Rows r >= H are padding (their outputs
    are discarded); their coefficients still produce finite positions."""
    r = jnp.arange(Hp, dtype=jnp.float32)
    cy = -(r + 0.5 - H / 2) / focal
    inv_f = 1.0 / focal
    cx_off = (0.5 - W / 2) / focal

    def affine(T):
        # T0*cx + T1*cy + T2 with cx = c*inv_f + cx_off -> (a*c + b) per row
        return T[0] * inv_f, T[0] * cx_off + T[1] * cy + T[2]

    pa, pb = affine(P)
    qa, qb = affine(Q)
    da, db = affine(D)
    pa = jnp.broadcast_to(pa, (Hp,))
    qa = jnp.broadcast_to(qa, (Hp,))
    da = jnp.broadcast_to(da, (Hp,))

    def at(a, b, c):
        return a * c + b

    eps = 1e-20
    den0 = at(da, db, 0.0)
    den1 = at(da, db, float(W - 1))
    p0 = at(pa, pb, 0.0) / den0
    p1 = at(pa, pb, float(W - 1)) / den1
    q0 = at(qa, qb, 0.0) / den0
    q1 = at(qa, qb, float(W - 1)) / den1
    dp = p1 - p0
    dq = q1 - q0
    beta_q = dq / jnp.where(jnp.abs(dp) < eps, eps, dp)  # q = a + b*p
    alpha_q = q0 - beta_q * p0
    beta_p = dp / jnp.where(jnp.abs(dq) < eps, eps, dq)  # p = a + b*q
    alpha_p = p0 - beta_p * q0
    return (pa, pb, qa, qb, da, db), (alpha_q, beta_q), (alpha_p, beta_p)


def _clip_range(order: int, n: int) -> Tuple[float, float]:
    # keep the kernel's support fully inside [0, n-1] (the gnomonic frame has
    # a >= 1-texel margin, so real pixels sit comfortably inside)
    return (0.0, n - 1.0) if order == 1 else (1.0, n - 2.0)


def _finite_clip(x, lo, hi):
    return jnp.clip(jnp.nan_to_num(x, nan=lo, posinf=hi, neginf=lo), lo, hi)


def warp_swap_for_pose(rotation: np.ndarray, axis: int, flip: bool,
                       height: int, width: int, focal: float) -> bool:
    """Host-side static decision: True when image rows run more along the q
    texel axis than p (a strongly rolled camera), in which case the two
    passes swap axes to keep pass A's line parametrization well-conditioned.
    Uses unscaled gnomonic coordinates (the texel grid scales p and q nearly
    isotropically)."""
    u_ax, v_ax = _uv_axes(axis)
    g = -1.0 if flip else 1.0
    R = np.asarray(rotation, np.float64).reshape(3, 3)

    def xy(cx, cy):
        d = R @ np.array([cx, cy, -1.0])
        return g * d[u_ax] / d[axis], g * d[v_ax] / d[axis]

    cy_mid = 0.0
    x0, y0 = xy((0.5 - width / 2) / focal, cy_mid)
    x1, y1 = xy((width - 0.5 - width / 2) / focal, cy_mid)
    return bool(abs(y1 - y0) > abs(x1 - x0))


# ------------------------------------------------------------------ pipeline


def _prefilter_last_axis(x):
    from thr3ed_atom_tpu.rendering.gnomonic import _bspline_prefilter_axis0

    return jnp.moveaxis(_bspline_prefilter_axis0(jnp.moveaxis(x, -1, 0)), 0, -1)


def warp_state_matmul(
    state,  # [SROWS, Pn, Qn] f32 composited gnomonic state
    xr,
    yr,
    rotation,  # [3, 3] f32 (traced)
    statics,
    height: int,
    width: int,
    focal,
    Pn: int,
    Qn: int,
    warp_order: int,
    swap: bool,
    interpret: bool,
):
    """Two-pass matmul warp of the composited state to the camera's pixels.
    Returns [H, W, 8] f32 (channels: colour rgb, acc, depth[, diffuse rgb],
    zero-padded) — the same channel layout as the gather path's padded src."""
    nch = 8 if statics.with_diffuse else 5
    CH = 8
    Hp = -(-height // 128) * 128
    Wp = -(-width // 128) * 128
    src = state[1:1 + nch]
    if nch < CH:
        src = jnp.pad(src, ((0, CH - nch), (0, 0), (0, 0)))

    P, Q, D = _homography_coeffs(rotation, statics, xr, yr, Pn, Qn, focal)
    (pa, pb, qa, qb, da, db), (alpha_q, beta_q), (alpha_p, beta_p) = (
        _row_coeffs(P, Q, D, height, width, Hp, focal)
    )

    carr = jnp.arange(Wp, dtype=jnp.float32)
    den = da[:, None] * carr[None, :] + db[:, None]
    den = jnp.where(jnp.abs(den) < 1e-20, 1e-20, den)

    if not swap:
        # pass A: along q for each texel column p; pass B: along p per row
        K2 = Pn
        first = jnp.transpose(src, (1, 0, 2))  # [Pn, CH, Qn]
        lo1, hi1 = _clip_range(warp_order, Qn)
        line_pos = _finite_clip(
            alpha_q[None, :]
            + beta_q[None, :] * jnp.arange(Pn, dtype=jnp.float32)[:, None],
            lo1, hi1,
        ).reshape(Pn, 1, Hp)
        lo2, hi2 = _clip_range(warp_order, Pn)
        pix_pos = _finite_clip(
            (pa[:, None] * carr[None, :] + pb[:, None]) / den, lo2, hi2
        ).reshape(Hp, 1, Wp)
    else:
        K2 = Qn
        first = jnp.transpose(src, (2, 0, 1))  # [Qn, CH, Pn]
        lo1, hi1 = _clip_range(warp_order, Pn)
        line_pos = _finite_clip(
            alpha_p[None, :]
            + beta_p[None, :] * jnp.arange(Qn, dtype=jnp.float32)[:, None],
            lo1, hi1,
        ).reshape(Qn, 1, Hp)
        lo2, hi2 = _clip_range(warp_order, Qn)
        pix_pos = _finite_clip(
            (qa[:, None] * carr[None, :] + qb[:, None]) / den, lo2, hi2
        ).reshape(Hp, 1, Wp)

    # orders 3/5 clamp each pass's interpolant to its central-tap hull (the
    # matmul analogue of the gather path's ringing clamp; order 5 clamps the
    # RECONSTRUCTION against the unfiltered neighbours like the gather path)
    if warp_order == 5:
        coeff = _prefilter_last_axis(first)
        y = resample_rows(coeff, line_pos, 5, interpret)
        t3 = resample_rows(first, line_pos, 1, interpret, True)
        t0, t1 = t3[:, 1], t3[:, 2]
        inter = jnp.clip(y, jnp.minimum(t0, t1), jnp.maximum(t0, t1))
    elif warp_order == 3:
        inter = resample_rows_clamped(first, line_pos, 3, interpret)
    else:
        inter = resample_rows(first, line_pos, 1, interpret)
    inter = jnp.transpose(inter, (2, 1, 0))  # [Hp, CH, lineN]
    K2p = -(-K2 // 128) * 128
    if K2p != K2:
        inter = jnp.pad(inter, ((0, 0), (0, 0), (0, K2p - K2)))
    if warp_order == 5:
        # prefilter over the zero-padded tail is harmless: positions are
        # clipped so no tap reaches the pad region
        coeff2 = _prefilter_last_axis(inter)
        y = resample_rows(coeff2, pix_pos, 5, interpret)
        t3 = resample_rows(inter, pix_pos, 1, interpret, True)
        t0, t1 = t3[:, 1], t3[:, 2]
        out = jnp.clip(y, jnp.minimum(t0, t1), jnp.maximum(t0, t1))
    elif warp_order == 3:
        out = resample_rows_clamped(inter, pix_pos, 3, interpret)
    else:
        out = resample_rows(inter, pix_pos, 1, interpret)
    return jnp.transpose(out, (0, 2, 1))[:height, :width, :]
