"""Fused slab-march volumetric render kernel (Pallas TPU).

This kernel replaces the whole gather-bound hot path of the reference renderer —
trilinear grid sampling (reference thre3d_atom/thre3d_reprs/voxels.py:295-321), SH
shading (rendering/volumetric/process.py:20) and alpha compositing
(rendering/volumetric/accumulate.py:49-88) — with ONE VMEM-resident MXU program per
16x16-pixel ray tile. Measured XLA gathers cap the old path at ~333K rays/s on v5e
(DESIGN_NOTES.md); this kernel never gathers from HBM per sample.

Design (validated by experiments/probe_slab_kernel.py / probe_slab_v4_gs8.py):

  * The scene grid is repacked per camera pose as ``[XG, U, V, GS*32]`` bf16, where the
    leading axis marches along the pose's dominant world axis in front-to-back order.
    Each of the ``GS = 8`` lane-blocks of 32 channels is one *slab*: the average of two
    adjacent vertex planes, i.e. the exact trilinear interpolant at the x-cell-center
    plane. One sample per slab crossing makes in-plane *bilinear* interpolation exactly
    *trilinear* at the sample points.
  * Rays are marched in tiles of R = 256 (16x16 pixels). Per (tile, group-of-8-slabs)
    the kernel DMAs one [PU=16, PV=24, 256] patch into VMEM (double-buffered), builds
    bilinear tent weights ``W [GS*R, PU*PV]`` in bf16 (tents ARE the bilinear weights:
    max(0, 1 - |u - uq|)), and computes all GS*R interpolations with ONE MXU matmul
    ``W @ patch``. SH shading folds through a per-ray Y-basis row and a static
    colour-fold selector matmul; transmittance is a running product in registers with
    per-tile early exit.
  * A per-tile traversal table (computed in XLA per pose, prefetched to SMEM) lists
    only the OCCUPIED groups front-to-back — empty space costs zero kernel time.

The backward pass (``slab_march_grad``) replays the march front-to-back using the
forward outputs as suffix-sum totals — no per-sample residuals are stored — and
accumulates per-patch gradients in VMEM, flushing once per (tile, group) with a
read-modify-write DMA into the repacked-grid cotangent (grid iterations are sequential
on a TPU core, so the RMW is race-free).

Grid-value dataflow: density is PRE-activated before repacking (reference
voxels.py:292-309 applies density_preactivation to the whole grid before
interpolation); the kernel applies the POST-activation (identity or relu) to the
interpolated density, then alpha = 1 - exp(-sigma * delta) (accumulate.py:49-63,
'pb' density2occupancy), sigmoid tone map, and front-to-back compositing.
"""
import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# ---------------------------------------------------------------------- constants

GS = 8  # slabs per group: one DMA'd patch serves GS slab crossings
LANES_PER_SLAB = 32  # 27 SH features + 1 density + 4 pad (supports SH degree <= 2)
LAN = GS * LANES_PER_SLAB  # 256 lanes per patch row
PU = 16  # patch extent (vertices) along u — untiled dim, arbitrary offsets
PV = 24  # patch extent along v — sublane dim, offsets must be 8-aligned
ROWS = PU * PV  # 384 = contraction size of the one-hot matmul
TILE_PX = 16  # pixel tile edge
R = TILE_PX * TILE_PX  # 256 rays per tile

# per-ray feature lanes ([T, R, RAY_LANES] f32)
RAY_LANES = 48
L_AU, L_BU, L_AV, L_BV, L_AT, L_BT, L_JMIN, L_JMAX, L_DELTA = range(9)
L_Y0 = 16  # 32 lanes of SH basis values Y_{c % ncoeff}(viewdir) start here

# output lanes ([T, R, 8] f32)
O_RGB = slice(0, 3)
O_ACC = 3
O_DEPTH = 4
O_DIFFUSE = slice(5, 8)


def _selectors(ncoeff: int):
    """Static [32, 8] colour-fold matrices: column j sums the feature lanes of colour
    j (full SH), and the diffuse variant picks only each colour's degree-0 lane."""
    nf = 3 * ncoeff
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES_PER_SLAB, 8), 0)
    j_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES_PER_SLAB, 8), 1)
    colour_of = c_iota // ncoeff
    sel = ((colour_of == j_iota) & (c_iota < nf)).astype(jnp.float32)
    sel_diffuse = (
        (colour_of == j_iota) & (c_iota % ncoeff == 0) & (c_iota < nf)
    ).astype(jnp.float32)
    return sel, sel_diffuse


def _make_forward_kernel(ncoeff: int, relu_sigma: bool, exit_eps: float,
                         with_diffuse: bool):
    nf = 3 * ncoeff  # density lane index

    def kernel(count_ref, tab_ref, rays_ref, grid_ref, out_ref):
        def body(patch, state, sem):
            count = count_ref[0, 0]
            au = rays_ref[0, :, L_AU]
            bu = rays_ref[0, :, L_BU]
            av = rays_ref[0, :, L_AV]
            bv = rays_ref[0, :, L_BV]
            at = rays_ref[0, :, L_AT]
            bt = rays_ref[0, :, L_BT]
            jmin = rays_ref[0, :, L_JMIN]
            jmax = rays_ref[0, :, L_JMAX]
            delta = rays_ref[0, :, L_DELTA]
            ytile = rays_ref[0, :, L_Y0:L_Y0 + LANES_PER_SLAB]  # [R, 32]

            ks3 = jax.lax.broadcasted_iota(jnp.int32, (GS, R, 1), 0).astype(
                jnp.float32
            )
            row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, ROWS), 2)
            uq3 = (row_iota // PV).astype(jnp.float32)
            vq3 = (row_iota % PV).astype(jnp.float32)
            sel, sel_diffuse = _selectors(ncoeff)

            state[...] = jnp.zeros_like(state)

            def get_dma(slot, i):
                return pltpu.make_async_copy(
                    grid_ref.at[
                        tab_ref[0, i, 0],
                        pl.ds(tab_ref[0, i, 1], PU),
                        pl.ds(pl.multiple_of(tab_ref[0, i, 2], 8), PV),
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
                xg = tab_ref[0, i, 0]
                u0f = tab_ref[0, i, 1].astype(jnp.float32)
                v0f = tab_ref[0, i, 2].astype(jnp.float32)
                slot = jax.lax.rem(i, 2)

                @pl.when(i + 1 < count)
                def _():
                    get_dma(jax.lax.rem(i + 1, 2), i + 1).start()

                get_dma(slot, i).wait()
                B = patch[slot].reshape(ROWS, LAN)

                # global slab index of each of this group's GS slabs, per ray
                jg3 = xg.astype(jnp.float32) * GS + ks3  # [GS, R, 1]
                u3 = au[None, :, None] + bu[None, :, None] * jg3 - u0f
                v3 = av[None, :, None] + bv[None, :, None] * jg3 - v0f
                live3 = (jg3 >= jmin[None, :, None]) & (jg3 <= jmax[None, :, None])

                # bilinear tents (f32 subtract for positional precision, bf16 products)
                du = (u3 - uq3).astype(jnp.bfloat16)
                dv = (v3 - vq3).astype(jnp.bfloat16)
                one = jnp.bfloat16(1.0)
                zero = jnp.bfloat16(0.0)
                wu = jnp.maximum(zero, one - jnp.abs(du))
                wv = jnp.maximum(zero, one - jnp.abs(dv))
                wu = jnp.where(live3, wu, zero)
                W = (wu * wv).reshape(GS * R, ROWS)
                interp = jnp.dot(W, B, preferred_element_type=jnp.float32)

                T_cur = T_in
                col_acc = jnp.zeros((R, 3), jnp.float32)
                acc_acc = jnp.zeros((R, 1), jnp.float32)
                dep_acc = jnp.zeros((R, 1), jnp.float32)
                dif_acc = jnp.zeros((R, 3), jnp.float32)
                base = xg.astype(jnp.float32) * GS
                for b in range(GS):
                    ch = interp[b * R:(b + 1) * R,
                                b * LANES_PER_SLAB:(b + 1) * LANES_PER_SLAB]
                    chy = ch * ytile
                    rgbraw = jnp.dot(chy, sel, preferred_element_type=jnp.float32)
                    sigma = ch[:, nf]
                    if relu_sigma:
                        sigma = jnp.maximum(sigma, 0.0)
                    alpha = jnp.clip(1.0 - jnp.exp(-sigma * delta), 0.0, 1.0)
                    w = alpha * T_cur
                    s_dep = at + bt * (base + b)
                    col_acc = col_acc + jax.nn.sigmoid(rgbraw[:, :3]) * w[:, None]
                    acc_acc = acc_acc + w[:, None]
                    dep_acc = dep_acc + (w * s_dep)[:, None]
                    if with_diffuse:
                        difraw = jnp.dot(
                            chy, sel_diffuse, preferred_element_type=jnp.float32
                        )
                        dif_acc = dif_acc + jax.nn.sigmoid(difraw[:, :3]) * w[:, None]
                    T_cur = T_cur * (1.0 - alpha)
                state[...] += jnp.concatenate(
                    [col_acc, acc_acc, dep_acc, dif_acc], axis=1
                )
                return i + 1, T_cur

            def group_cond(carry):
                i, T_cur = carry
                return (i < count) & (jnp.max(T_cur) > exit_eps)

            jax.lax.while_loop(
                group_cond, group_body, (0, jnp.ones((R,), jnp.float32))
            )
            out_ref[0] = state[...]

        pl.run_scoped(
            body,
            patch=pltpu.VMEM((2, PU, PV, LAN), jnp.bfloat16),
            state=pltpu.VMEM((R, 8), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((2,)),
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("ncoeff", "relu_sigma", "exit_eps", "with_diffuse",
                              "interpret")
)
def slab_march_render(
    tables: jnp.ndarray,  # [T, G, 4] int32: (group idx = grid's leading idx, u0, v0, 0)
    counts: jnp.ndarray,  # [T, 1] int32: number of active table entries per tile
    rays_feat: jnp.ndarray,  # [T, R, RAY_LANES] f32 (lane layout above)
    grid: jnp.ndarray,  # [XG, U_pad, V_pad, GS*32] bf16 repacked slab grid
    *,
    ncoeff: int,  # SH coefficients per colour ((degree + 1)^2), <= 9
    relu_sigma: bool = False,  # density POST-activation: relu (True) or identity
    exit_eps: float = 1e-4,  # per-tile early-exit transmittance threshold
    with_diffuse: bool = False,  # also composite the degree-0 (diffuse) colour
    interpret: bool = False,
) -> jnp.ndarray:  # [T, R, 8] f32: rgb, acc, depth, diffuse rgb
    num_tiles, num_groups, _ = tables.shape
    assert rays_feat.shape == (num_tiles, R, RAY_LANES), rays_feat.shape
    assert grid.shape[-1] == LAN and grid.dtype == jnp.bfloat16
    assert counts.shape == (num_tiles, 1)
    assert 1 <= ncoeff <= 9
    kernel = _make_forward_kernel(ncoeff, relu_sigma, exit_eps, with_diffuse)
    return pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda t: (t, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, num_groups, 4), lambda t: (t, 0, 0), memory_space=pltpu.SMEM
            ),
            pl.BlockSpec(
                (1, R, RAY_LANES), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, R, 8), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, R, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
        interpret=interpret,
    )(counts, tables, rays_feat, grid)
