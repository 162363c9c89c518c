"""Fused plane-march volumetric render kernel with analytic per-cell integration.

Round-3 successor of ``slab_march.py`` (same tile/patch/one-hot-matmul machinery —
see that module's docstring for the lineage vs the reference hot path
thre3d_atom/thre3d_reprs/voxels.py:295-321 + process.py:20 + accumulate.py:49-88).
The differences, driven by the measured probes (DESIGN_NOTES.md, round-3 section):

  * **Plane marching**: the kernel interpolates the field at the grid's *vertex
    planes* along the march axis (the true trilinear field restricted to a plane is
    exactly bilinear there — no slab averaging), and composites the GS-1 *cells
    between consecutive planes*.
  * **Analytic transmittance**: within a cell the density is approximated as linear
    in march depth between its two plane crossings, and the transmittance integral
    of ``relu(linear)`` has a closed form — the exact integral of the linear model
    rather than a K-point quadrature of it.  Measured on random relu fields this
    matches K=1 sampling in colour but beats K=2 supersampling ~2.3x in opacity
    accuracy at about half of K=2's interpolation count
    (experiments/quality_analytic.py).  It is also deterministic: no stratified
    theta jitter, which removes the K=1 gradient-noise failure documented in
    PARITY_RUN.md.
  * **Sigma-weighted emission**: the cell colour is the sigmoid of the raw SH
    radiance lerped to the density centroid ``tbar = (int t sigma dt)/(int sigma
    dt)`` of the cell (the "trap wcol" variant of the probes); depth uses the same
    centroid.  ``tbar`` is treated as locally constant in the backward pass (its
    derivative wrt the endpoint densities is dropped — a quadrature detail, not a
    transport term; the jnp oracle in tests applies the same stop-gradient).
  * **GS = 8 planes per entry** (7 cells): entries overlap by exactly one plane
    (group g covers global planes ``[g*(GS-1), g*(GS-1) + GS-1]``), which keeps
    every cell's gradient local to one entry; the repacked grid stores boundary
    planes twice and the repack's autodiff sums the duplicates.  The larger group
    amortizes the measured ~2.9 us fixed per-entry cost.

Backward is the same replay scheme as slab_march: totals from the forward output
reconstruct suffix sums front-to-back, the per-cell dL/d(integral) is
``delta * ((1 - alpha) * T * <g, x> - <g, suffix>)``, and the closed-form
``d integral / d endpoint`` factors split it onto the two planes.  Per-entry patch
gradients (W^T @ d_interp) accumulate into the repacked-grid cotangent with a
read-modify-write DMA (race-free: grid steps are sequential on a TPU core).
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------------- constants

GS = 8  # planes per group -> GS - 1 cells per entry; groups overlap by one plane
PU = 16  # patch extent (vertices) along u — untiled dim, arbitrary offsets
PV = 24  # patch extent along v — sublane dim, offsets must be 8-aligned
ROWS = PU * PV  # 384 = contraction size of the one-hot matmul

# per-ray feature lanes ([T, R, ray_lanes] f32); the SH basis block starts at L_Y0
# and is lanes_per_plane wide (32 for SH degree <= 2, 64 for degree 3)
L_AU, L_BU, L_AV, L_BV, L_AT, L_BT, L_JMIN, L_JMAX, L_DELTA = range(9)
L_Y0 = 16

# output lanes ([T, R, 8] f32)
O_RGB = slice(0, 3)
O_ACC = 3
O_DEPTH = 4
O_DIFFUSE = slice(5, 8)


def ray_lanes_for(lanes_per_plane: int) -> int:
    return L_Y0 + lanes_per_plane


def _selectors(ncoeff: int, lanes_per_plane: int):
    """Static [lanes_per_plane, 8] colour-fold matrices (see slab_march._selectors)."""
    nf = 3 * ncoeff
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (lanes_per_plane, 8), 0)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (lanes_per_plane, 8), 1)
    colour_of = c_iota // ncoeff
    sel = ((colour_of == j_iota) & (c_iota < nf)).astype(jnp.float32)
    sel_diffuse = (
        (colour_of == j_iota) & (c_iota % ncoeff == 0) & (c_iota < nf)
    ).astype(jnp.float32)
    return sel, sel_diffuse


def _relu_trap(a, b, relu_sigma: bool):
    """Closed-form cell integrals of the linear density model.

    Returns (integ, tbar, dIda, dIdb) for ``I = int_0^1 act(a + (b - a) t) dt``
    with act = relu (relu_sigma) or identity (non-negative preactivated grids):
    the mean density, its emission centroid, and its endpoint derivatives.
    """
    if not relu_sigma:
        # identity post-activation: grids are pre-activated non-negative (abs /
        # softplus preactivation), so the linear model is non-negative too
        mean = 0.5 * (a + b)
        integ = jnp.maximum(mean, 0.0)
        num = a / 2.0 + (b - a) / 3.0
        tbar = jnp.clip(num / jnp.maximum(integ, 1e-9), 0.0, 1.0)
        half = jnp.where(mean > 0.0, 0.5, 0.0)
        return integ, tbar, half, half

    p = jnp.maximum(a, 0.0)
    q = jnp.maximum(b, 0.0)
    s = a - b
    safe = jnp.where(jnp.abs(s) > 1e-6, s, jnp.float32(1.0))
    both = jnp.abs(s) <= 1e-6
    # factored form (p+q)/2 * (p-q)/s: when both endpoints are positive p-q == s
    # exactly, so the ratio is exactly 1 and no cancellation occurs (the naive
    # (p^2-q^2)/(2s) loses ~all precision for near-equal endpoints in f32)
    integ = jnp.where(both, 0.5 * (p + q), 0.5 * (p + q) * (p - q) / safe)
    ts = jnp.clip(a / safe, 0.0, 1.0)  # zero crossing of the linear model

    def F(t):  # int_0^t (a + (b - a) t') t' dt'
        return a * t * t / 2.0 + (b - a) * t * t * t / 3.0

    one = jnp.float32(1.0)
    pos_a, pos_b = a > 0.0, b > 0.0
    num = jnp.where(
        pos_a & pos_b,
        F(one),
        jnp.where(pos_a, F(ts), F(one) - F(ts)),  # a>0>b: head; a<0<b: tail
    )
    num = jnp.where(pos_a | pos_b, num, 0.0)
    tbar = jnp.clip(num / jnp.maximum(integ, 1e-9), 0.0, 1.0)

    # dI/da = int (1 - t) over the active range, dI/db = int t over it
    half = jnp.float32(0.5)
    dIda = jnp.where(
        pos_a & pos_b,
        half,
        jnp.where(
            pos_a,
            ts - 0.5 * ts * ts,  # active [0, ts]
            jnp.where(pos_b, 0.5 * (one - ts) * (one - ts), 0.0),  # active [ts, 1]
        ),
    )
    dIdb = jnp.where(
        pos_a & pos_b,
        half,
        jnp.where(
            pos_a,
            0.5 * ts * ts,
            jnp.where(pos_b, 0.5 * (one - ts * ts), 0.0),
        ),
    )
    return integ, tbar, dIda, dIdb


def _entry_geometry(tab_ref, rays_ref, i, lanes_per_plane, R):
    """Shared per-entry W-build inputs: node coords, liveness, patch-local tents."""
    au = rays_ref[0, :, L_AU]
    bu = rays_ref[0, :, L_BU]
    av = rays_ref[0, :, L_AV]
    bv = rays_ref[0, :, L_BV]
    jmin = rays_ref[0, :, L_JMIN]
    jmax = rays_ref[0, :, L_JMAX]

    xg = tab_ref[0, i + 1, 0]
    u0f = tab_ref[0, i + 1, 1].astype(jnp.float32)
    v0f = tab_ref[0, i + 1, 2].astype(jnp.float32)
    jpack = tab_ref[0, i + 1, 3]
    jlo_e = (jpack // 256).astype(jnp.float32)
    jhi_e = jax.lax.rem(jpack, 256).astype(jnp.float32)

    ks3 = jax.lax.broadcasted_iota(jnp.int32, (GS, R, 1), 0).astype(jnp.float32)
    # global plane index of lane-block k of this entry (stride GS - 1: overlap)
    jg3 = (xg * (GS - 1)).astype(jnp.float32) + ks3  # [GS, R, 1]
    u3 = au[None, :, None] + bu[None, :, None] * jg3 - u0f
    v3 = av[None, :, None] + bv[None, :, None] * jg3 - v0f
    live3 = (jg3 >= jmin[None, :, None]) & (jg3 <= jmax[None, :, None])
    live3 = live3 & (ks3 >= jlo_e) & (ks3 <= jhi_e)
    return xg, u3, v3, live3, ks3, jlo_e, jhi_e


def _build_w(u3, v3, live3, R):
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ROWS), 2)
    uq3 = (row_iota // PV).astype(jnp.float32)
    vq3 = (row_iota % PV).astype(jnp.float32)
    du = (u3 - uq3).astype(jnp.bfloat16)
    dv = (v3 - vq3).astype(jnp.bfloat16)
    one = jnp.bfloat16(1.0)
    zero = jnp.bfloat16(0.0)
    wu = jnp.maximum(zero, one - jnp.abs(du))
    wv = jnp.maximum(zero, one - jnp.abs(dv))
    wu = jnp.where(live3, wu, zero)
    return (wu * wv).reshape(GS * R, ROWS)


def _batched_planes(interp, live3, ytile, sel, sel_diffuse, nf, lanes_per_plane,
                    with_diffuse, R):
    """Per-plane folds, batched: diagonal blocks of ``interp`` -> raw sigma
    [GS, R], raw rgb [GS, R, 3] (and diffuse), plane liveness [GS, R]."""
    LAN = GS * lanes_per_plane
    interp3 = interp.reshape(GS, R, LAN)
    ch_all = jnp.stack(
        [
            interp3[b, :, b * lanes_per_plane:(b + 1) * lanes_per_plane]
            for b in range(GS)
        ],
        axis=0,
    )  # [GS, R, PL]
    sigma_all = ch_all[:, :, nf]
    chy_all = (ch_all * ytile[None]).reshape(GS * R, lanes_per_plane)
    rgb_all = jnp.dot(chy_all, sel, preferred_element_type=jnp.float32)[
        :, :3
    ].reshape(GS, R, 3)
    if with_diffuse:
        dif_all = jnp.dot(chy_all, sel_diffuse, preferred_element_type=jnp.float32)[
            :, :3
        ].reshape(GS, R, 3)
    else:
        dif_all = None
    live2 = live3[:, :, 0]  # [GS, R]
    return sigma_all, rgb_all, dif_all, live2


def _batched_cells(interp, live3, ytile, sel, sel_diffuse, nf, lanes_per_plane,
                   relu_sigma, with_diffuse, xg, at, bt, delta, R,
                   want_grads=False):
    """Batched per-cell quantities for an entry: alpha [GS-1, R], emission
    colours mid/dmid [GS-1, R, 3], centroid depth s_dep [GS-1, R]; with
    ``want_grads`` also the backward factors (integ derivative splits, lerp
    weights, raw plane folds, cell liveness)."""
    sigma_all, rgb_all, dif_all, live2 = _batched_planes(
        interp, live3, ytile, sel, sel_diffuse, nf, lanes_per_plane,
        with_diffuse, R,
    )
    a_s, b_s = sigma_all[:-1], sigma_all[1:]
    integ, tbar, dIda, dIdb = _relu_trap(a_s, b_s, relu_sigma)
    cell_live = live2[:-1] & live2[1:]
    integ = jnp.where(cell_live, integ, 0.0)
    alpha = jnp.clip(1.0 - jnp.exp(-integ * delta[None]), 0.0, 1.0)
    tb = tbar[..., None]
    midraw = (1.0 - tb) * rgb_all[:-1] + tb * rgb_all[1:]
    mid = jax.nn.sigmoid(midraw)
    if with_diffuse:
        dmidraw = (1.0 - tb) * dif_all[:-1] + tb * dif_all[1:]
        dmid = jax.nn.sigmoid(dmidraw)
    else:
        dmid = None
    base = (xg * (GS - 1)).astype(jnp.float32)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (GS - 1, R), 0).astype(
        jnp.float32
    )
    s_dep = at[None] + bt[None] * (base + c_iota + tbar)
    if not want_grads:
        return alpha, mid, dmid, s_dep
    return alpha, mid, dmid, s_dep, integ, tbar, dIda, dIdb, cell_live


def _make_forward_kernel(ncoeff: int, lanes_per_plane: int, relu_sigma: bool,
                         exit_eps: float, with_diffuse: bool, rays_per_tile: int):
    nf = 3 * ncoeff  # density lane index within a plane's lane block
    R = rays_per_tile
    LAN = GS * lanes_per_plane
    ray_lanes = ray_lanes_for(lanes_per_plane)

    def kernel(tab_ref, rays_ref, grid_ref, out_ref):
        def body(patch, state, sem):
            count = tab_ref[0, 0, 0]
            goff = tab_ref[0, 0, 1]
            at = rays_ref[0, :, L_AT]
            bt = rays_ref[0, :, L_BT]
            delta = rays_ref[0, :, L_DELTA]
            ytile = rays_ref[0, :, L_Y0:L_Y0 + lanes_per_plane]  # [R, PL]
            sel, sel_diffuse = _selectors(ncoeff, lanes_per_plane)

            state[...] = jnp.zeros_like(state)

            def get_dma(slot, i):
                return pltpu.make_async_copy(
                    grid_ref.at[
                        tab_ref[0, i + 1, 0] - goff,
                        pl.ds(tab_ref[0, i + 1, 1], PU),
                        pl.ds(pl.multiple_of(tab_ref[0, i + 1, 2], 8), PV),
                        :,
                    ],
                    patch.at[slot],
                    sem.at[slot],
                )

            @pl.when(count > 0)
            def _():
                get_dma(0, 0).start()

            def group_body(carry):
                i, T_in = carry
                slot = jax.lax.rem(i, 2)

                @pl.when(i + 1 < count)
                def _():
                    get_dma(jax.lax.rem(i + 1, 2), i + 1).start()

                get_dma(slot, i).wait()
                B = patch[slot].reshape(ROWS, LAN)

                xg, u3, v3, live3, ks3, jlo_e, jhi_e = _entry_geometry(
                    tab_ref, rays_ref, i, lanes_per_plane, R
                )
                W = _build_w(u3, v3, live3, R)
                interp = jnp.dot(W, B, preferred_element_type=jnp.float32)

                # all expensive math is BATCHED over the entry's planes/cells
                # ([GS, R] / [GS-1, R] arrays keep the VPU lanes full); only the
                # cheap transmittance multiply-add chain runs per cell
                (alpha, mid, dmid, s_dep) = _batched_cells(
                    interp, live3, ytile, sel, sel_diffuse, nf, lanes_per_plane,
                    relu_sigma, with_diffuse, xg, at, bt, delta, R,
                )

                T_cur = T_in
                col_acc = jnp.zeros((R, 3), jnp.float32)
                acc_acc = jnp.zeros((R, 1), jnp.float32)
                dep_acc = jnp.zeros((R, 1), jnp.float32)
                dif_acc = jnp.zeros((R, 3), jnp.float32)
                for c in range(GS - 1):
                    w = alpha[c] * T_cur
                    col_acc = col_acc + mid[c] * w[:, None]
                    acc_acc = acc_acc + w[:, None]
                    dep_acc = dep_acc + (w * s_dep[c])[:, None]
                    if with_diffuse:
                        dif_acc = dif_acc + dmid[c] * w[:, None]
                    T_cur = T_cur * (1.0 - alpha[c])
                state[...] += jnp.concatenate(
                    [col_acc, acc_acc, dep_acc, dif_acc], axis=1
                )
                return i + 1, T_cur

            def group_cond(carry):
                i, T_cur = carry
                return (i < count) & (jnp.max(T_cur) > exit_eps)

            i_final, _ = jax.lax.while_loop(
                group_cond, group_body, (0, jnp.ones((R,), jnp.float32))
            )

            # drain the early-exit lookahead DMA (see slab_march)
            @pl.when(i_final < count)
            def _():
                get_dma(jax.lax.rem(i_final, 2), i_final).wait()

            out_ref[0] = state[...]

        pl.run_scoped(
            body,
            patch=pltpu.VMEM((2, PU, PV, LAN), jnp.bfloat16),
            state=pltpu.VMEM((R, 8), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((2,)),
        )

    return kernel


def _tab_with_meta(tables, counts, group_offset):
    num_tiles = tables.shape[0]
    goff = jnp.broadcast_to(jnp.asarray(group_offset, jnp.int32), (num_tiles, 1))
    meta = jnp.concatenate(
        [counts.astype(jnp.int32), goff, jnp.zeros((num_tiles, 2), jnp.int32)],
        axis=1,
    )[:, None, :]
    return jnp.concatenate([meta, tables], axis=1)  # [T, G + 1, 4]


@functools.partial(
    jax.jit,
    static_argnames=("ncoeff", "relu_sigma", "exit_eps", "with_diffuse", "interpret"),
)
def plane_march_render(
    tables: jnp.ndarray,  # [T, G, 4] int32: (GLOBAL group idx, u0, v0, jlo*256+jhi)
    counts: jnp.ndarray,  # [T, 1] int32
    rays_feat: jnp.ndarray,  # [T, R, ray_lanes] f32
    grid: jnp.ndarray,  # [XG, U_pad, V_pad, GS*PL] bf16 repacked plane grid
    *,
    ncoeff: int,
    relu_sigma: bool = False,
    exit_eps: float = 1e-4,
    with_diffuse: bool = False,
    group_offset=0,
    interpret: bool = False,
) -> jnp.ndarray:  # [T, R, 8] f32: rgb, acc, depth, diffuse rgb
    num_tiles, num_groups, _ = tables.shape
    rays_per_tile = rays_feat.shape[1]
    lanes_per_plane = 32 if ncoeff <= 9 else 64
    assert grid.shape[-1] == GS * lanes_per_plane and grid.dtype == jnp.bfloat16
    assert rays_feat.shape == (
        num_tiles, rays_per_tile, ray_lanes_for(lanes_per_plane)
    ), rays_feat.shape
    assert counts.shape == (num_tiles, 1)
    assert 1 <= ncoeff <= 16
    kernel = _make_forward_kernel(
        ncoeff, lanes_per_plane, relu_sigma, exit_eps, with_diffuse, rays_per_tile
    )
    tab_full = _tab_with_meta(tables, counts, group_offset)
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, num_groups + 1, 4), lambda t: (t, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, rays_per_tile, rays_feat.shape[-1]),
                lambda t: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, rays_per_tile, 8), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, rays_per_tile, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tab_full, rays_feat, grid)


# ============================================================== backward (custom VJP)


def _make_backward_kernel(ncoeff: int, lanes_per_plane: int, relu_sigma: bool,
                          exit_eps: float, with_diffuse: bool, rays_per_tile: int):
    """Replay backward; see module docstring.  Per cell the dL/d(integral) follows
    the same suffix-sum reconstruction as slab_march's dsigma, then the closed-form
    (dI/da, dI/db) factors route it onto the cell's two planes; colour/diffuse
    cotangents lerp back with (1 - tbar, tbar), with tbar treated as constant."""
    nf = 3 * ncoeff
    R = rays_per_tile
    LAN = GS * lanes_per_plane

    def kernel(tab_ref, rays_ref, gout_ref, fwd_ref, grid_ref, _dgrid_in_ref,
               dgrid_ref):
        def body(patch, gpatch, sem, gsem):
            count = tab_ref[0, 0, 0]
            goff = tab_ref[0, 0, 1]
            at = rays_ref[0, :, L_AT]
            bt = rays_ref[0, :, L_BT]
            delta = rays_ref[0, :, L_DELTA]
            ytile = rays_ref[0, :, L_Y0:L_Y0 + lanes_per_plane]

            g_col = gout_ref[0, :, 0:3]
            g_acc = gout_ref[0, :, 3]
            g_dep = gout_ref[0, :, 4]
            g_dif = gout_ref[0, :, 5:8]
            tot = fwd_ref[0]  # [R, 8] forward totals

            sel, sel_diffuse = _selectors(ncoeff, lanes_per_plane)
            lane_iota = jax.lax.broadcasted_iota(
                jnp.int32, (1, lanes_per_plane), 1
            )
            onehot_sigma = (lane_iota == nf).astype(jnp.float32)

            def get_dma(slot, i):
                return pltpu.make_async_copy(
                    grid_ref.at[
                        tab_ref[0, i + 1, 0] - goff,
                        pl.ds(tab_ref[0, i + 1, 1], PU),
                        pl.ds(pl.multiple_of(tab_ref[0, i + 1, 2], 8), PV),
                        :,
                    ],
                    patch.at[slot],
                    sem.at[slot],
                )

            @pl.when(count > 0)
            def _():
                get_dma(0, 0).start()

            def entry_body(carry):
                i, T_in, P_in = carry
                u0 = tab_ref[0, i + 1, 1]
                v0 = pl.multiple_of(tab_ref[0, i + 1, 2], 8)
                slot = jax.lax.rem(i, 2)

                @pl.when(i + 1 < count)
                def _():
                    get_dma(jax.lax.rem(i + 1, 2), i + 1).start()

                get_dma(slot, i).wait()
                B = patch[slot].reshape(ROWS, LAN)

                xg, u3, v3, live3, ks3, jlo_e, jhi_e = _entry_geometry(
                    tab_ref, rays_ref, i, lanes_per_plane, R
                )
                W = _build_w(u3, v3, live3, R)
                interp = jnp.dot(W, B, preferred_element_type=jnp.float32)

                (alpha, mid, dmid, s_dep, _integ, tbar, dIda, dIdb, cell_live
                 ) = _batched_cells(
                    interp, live3, ytile, sel, sel_diffuse, nf, lanes_per_plane,
                    relu_sigma, with_diffuse, xg, at, bt, delta, R,
                    want_grads=True,
                )

                # cheap sequential chains: transmittance prefix + suffix sums
                T_list = []
                T_cur = T_in
                for c in range(GS - 1):
                    T_list.append(T_cur)
                    T_cur = T_cur * (1.0 - alpha[c])
                Ts = jnp.stack(T_list, axis=0)  # [GS-1, R]
                w_all = alpha * Ts

                if with_diffuse:
                    dif_part = dmid * w_all[..., None]
                else:
                    dif_part = jnp.zeros((GS - 1, R, 3), jnp.float32)
                contrib = jnp.concatenate(
                    [
                        mid * w_all[..., None],
                        w_all[..., None],
                        (w_all * s_dep)[..., None],
                        dif_part,
                    ],
                    axis=-1,
                )  # [GS-1, R, 8]
                P = P_in
                S_list = []
                for c in range(GS - 1):
                    P = P + contrib[c]
                    S_list.append(tot - P)  # suffix sums EXCLUDING cell c
                S = jnp.stack(S_list, axis=0)  # [GS-1, R, 8]

                inner = (
                    jnp.sum(g_col[None] * mid, axis=-1)
                    + g_acc[None]
                    + g_dep[None] * s_dep
                )
                suff = (
                    jnp.sum(g_col[None] * S[..., 0:3], axis=-1)
                    + g_acc[None] * S[..., 3]
                    + g_dep[None] * S[..., 4]
                )
                if with_diffuse:
                    inner = inner + jnp.sum(g_dif[None] * dmid, axis=-1)
                    suff = suff + jnp.sum(g_dif[None] * S[..., 5:8], axis=-1)
                dinteg = delta[None] * ((1.0 - alpha) * Ts * inner - suff)
                dinteg = jnp.where(cell_live, dinteg, 0.0)
                d_a = dinteg * dIda  # [GS-1, R]
                d_b = dinteg * dIdb

                tb = tbar[..., None]
                d_midraw = g_col[None] * w_all[..., None] * mid * (1.0 - mid)
                z1 = jnp.zeros((1, R), jnp.float32)
                z13 = jnp.zeros((1, R, 3), jnp.float32)
                # plane k collects d_a from cell k and d_b from cell k - 1
                d_sig_planes = jnp.concatenate([d_a, z1], 0) + jnp.concatenate(
                    [z1, d_b], 0
                )  # [GS, R]
                d_rgb_planes = jnp.concatenate(
                    [(1.0 - tb) * d_midraw, z13], 0
                ) + jnp.concatenate([z13, tb * d_midraw], 0)  # [GS, R, 3]

                d_raw8 = jnp.concatenate(
                    [d_rgb_planes, jnp.zeros((GS, R, 5), jnp.float32)], axis=-1
                ).reshape(GS * R, 8)
                d_chy = jnp.dot(d_raw8, sel.T, preferred_element_type=jnp.float32)
                if with_diffuse:
                    d_dmidraw = g_dif[None] * w_all[..., None] * dmid * (1.0 - dmid)
                    d_dif_planes = jnp.concatenate(
                        [(1.0 - tb) * d_dmidraw, z13], 0
                    ) + jnp.concatenate([z13, tb * d_dmidraw], 0)
                    d_chy = d_chy + jnp.dot(
                        jnp.concatenate(
                            [d_dif_planes, jnp.zeros((GS, R, 5), jnp.float32)],
                            axis=-1,
                        ).reshape(GS * R, 8),
                        sel_diffuse.T,
                        preferred_element_type=jnp.float32,
                    )
                d_ch_all = (
                    d_chy.reshape(GS, R, lanes_per_plane) * ytile[None]
                    + d_sig_planes[..., None] * onehot_sigma[None]
                )  # [GS, R, PL]

                d_blocks = []
                for b in range(GS):
                    d_ch = d_ch_all[b]
                    pre = b * lanes_per_plane
                    post = LAN - (b + 1) * lanes_per_plane
                    parts = []  # Mosaic rejects zero-width operands
                    if pre:
                        parts.append(jnp.zeros((R, pre), jnp.float32))
                    parts.append(d_ch)
                    if post:
                        parts.append(jnp.zeros((R, post), jnp.float32))
                    d_blocks.append(
                        jnp.concatenate(parts, axis=1) if len(parts) > 1 else d_ch
                    )

                d_interp = jnp.concatenate(d_blocks, axis=0)  # [GS*R, LAN]
                d_b = jax.lax.dot_general(
                    W,
                    d_interp.astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [ROWS, LAN]

                region = dgrid_ref.at[xg - goff, pl.ds(u0, PU), pl.ds(v0, PV), :]
                rd = pltpu.make_async_copy(region, gpatch, gsem)
                rd.start()
                rd.wait()
                gpatch[...] = gpatch[...] + d_b.reshape(PU, PV, LAN)
                wr = pltpu.make_async_copy(gpatch, region, gsem)
                wr.start()
                wr.wait()
                return i + 1, T_cur, P

            def entry_cond(carry):
                i, T_cur, _p = carry
                return (i < count) & (jnp.max(T_cur) > exit_eps)

            i_final, _, _ = jax.lax.while_loop(
                entry_cond,
                entry_body,
                (0, jnp.ones((R,), jnp.float32), jnp.zeros((R, 8), jnp.float32)),
            )

            @pl.when(i_final < count)
            def _():
                get_dma(jax.lax.rem(i_final, 2), i_final).wait()

        pl.run_scoped(
            body,
            patch=pltpu.VMEM((2, PU, PV, LAN), jnp.bfloat16),
            gpatch=pltpu.VMEM((PU, PV, LAN), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((2,)),
            gsem=pltpu.SemaphoreType.DMA(()),
        )

    return kernel


def _forward_impl(tables, counts, rays_feat, grid, group_offset, ncoeff,
                  relu_sigma, exit_eps, with_diffuse, interpret):
    return plane_march_render(
        tables, counts, rays_feat, grid,
        ncoeff=ncoeff, relu_sigma=relu_sigma, exit_eps=exit_eps,
        with_diffuse=with_diffuse, group_offset=group_offset, interpret=interpret,
    )


def _backward_impl(tables, counts, rays_feat, grid, group_offset, fwd_out, gout,
                   ncoeff, relu_sigma, exit_eps, with_diffuse, interpret):
    num_tiles, num_groups, _ = tables.shape
    rays_per_tile = rays_feat.shape[1]
    lanes_per_plane = 32 if ncoeff <= 9 else 64
    kernel = _make_backward_kernel(
        ncoeff, lanes_per_plane, relu_sigma, exit_eps, with_diffuse, rays_per_tile
    )
    tab_full = _tab_with_meta(tables, counts, group_offset)
    dgrid_init = jnp.zeros(grid.shape, jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (1, num_groups + 1, 4), lambda t: (t, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, rays_per_tile, rays_feat.shape[-1]),
                lambda t: (t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, rays_per_tile, 8), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, rays_per_tile, 8), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(grid.shape, jnp.float32),
        input_output_aliases={5: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        interpret=interpret,
    )(tab_full, rays_feat, gout, fwd_out, grid, dgrid_init)


@functools.lru_cache(maxsize=None)
def _make_differentiable(ncoeff, relu_sigma, exit_eps, with_diffuse, interpret):
    @jax.custom_vjp
    def march(tables, counts, rays_feat, grid, group_offset):
        return _forward_impl(tables, counts, rays_feat, grid, group_offset,
                             ncoeff, relu_sigma, exit_eps, with_diffuse, interpret)

    def fwd(tables, counts, rays_feat, grid, group_offset):
        out = _forward_impl(tables, counts, rays_feat, grid, group_offset,
                            ncoeff, relu_sigma, exit_eps, with_diffuse, interpret)
        return out, (tables, counts, rays_feat, grid, group_offset, out)

    def bwd(res, gout):
        tables, counts, rays_feat, grid, group_offset, out = res
        d_grid = _backward_impl(
            tables, counts, rays_feat, grid, group_offset, out, gout, ncoeff,
            relu_sigma, exit_eps, with_diffuse, interpret,
        ).astype(grid.dtype)
        return None, None, None, d_grid, None

    march.defvjp(fwd, bwd)
    return march


def plane_march(
    tables, counts, rays_feat, grid, *, ncoeff, relu_sigma=False, exit_eps=1e-4,
    with_diffuse=False, group_offset=0, interpret=False,
):
    """Differentiable plane-march render: gradients flow to ``grid`` (the repacked
    bf16 plane grid) through the replay backward kernel; tables/counts/rays are
    non-differentiable sampling geometry.  ``group_offset`` rebases global group
    indices onto a depth-segment grid operand (sample parallelism)."""
    fn = _make_differentiable(
        ncoeff, bool(relu_sigma), float(exit_eps), bool(with_diffuse),
        bool(interpret),
    )
    return fn(tables, counts, rays_feat, grid, jnp.asarray(group_offset, jnp.int32))
