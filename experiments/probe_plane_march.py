"""Probe candidate reformulations of the slab-march kernel (round 3).

The round-2 kernel plateaued at ~0.25-0.32 G shaded samples/s: per (tile, group)
entry ~5.7 us = matmul [1024,768]@[768,128] (~3.3) + tent W-build over
[GS*R, 768] (~1.8) + per-slab composite/selector matmuls (~0.6). This probe
measures the round-3 levers in isolation, on dense traversals (no early exit, no
occupancy skipping) so per-entry cost is clean:

  patch    : PU x PV 24x32 (ROWS 768, round 2) vs 16x24 (ROWS 384)
  W build  : 'full'  = round-2 replica (f32 subtract on [GS,R,ROWS], where(live))
             'lean'  = clamp u3 out of range instead of where(live); fewer passes
  fold     : 'matmul' = per-slab [R,32]@[32,8] selector matmuls (round 2)
             'roll'   = 4-roll lane sum-of-9, slice lanes 0/9/18 + sigma lane
  composite: 'sample'   = round-2 semantics (one sample per slab, cell centers)
             'analytic' = plane marching: interp GS vertex planes, composite the
                          GS-1 cells between them with the exact trapezoid
                          integral of relu(linear sigma) -- K=inf quality at
                          K=1 cost (entries overlap by one plane)

Run:  python experiments/probe_plane_march.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import thr3ed_atom_tpu  # noqa: F401  (compilation cache)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GS = 4
LANES = 32
LAN = GS * LANES
R = 256
NCOEFF = 9
NF = 27  # sigma lane


def make_kernel(pu, pv, w_mode, fold_mode, composite, relu_sigma=True,
                parts=("dma", "w", "matmul", "fold", "acc")):
    rows = pu * pv

    def kernel(tab_ref, rays_ref, grid_ref, out_ref):
        def body(patch, state, sem):
            count = tab_ref[0, 0, 0]
            au = rays_ref[0, :, 0]
            bu = rays_ref[0, :, 1]
            av = rays_ref[0, :, 2]
            bv = rays_ref[0, :, 3]
            at = rays_ref[0, :, 4]
            bt = rays_ref[0, :, 5]
            jmin = rays_ref[0, :, 6]
            jmax = rays_ref[0, :, 7]
            delta = rays_ref[0, :, 8]
            ytile = rays_ref[0, :, 16:48]  # [R, 32]

            ks3 = jax.lax.broadcasted_iota(jnp.int32, (GS, R, 1), 0).astype(
                jnp.float32
            )
            row_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, rows), 2)
            uq3 = (row_iota // pv).astype(jnp.float32)
            vq3 = (row_iota % pv).astype(jnp.float32)
            # selector [32, 8]: cols 0-2 sum each colour's ncoeff lanes, col 3 = sigma
            c_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, 8), 0)
            j_iota = jax.lax.broadcasted_iota(jnp.int32, (LANES, 8), 1)
            sel = (
                ((c_iota // NCOEFF == j_iota) & (c_iota < NF))
                | ((c_iota == NF) & (j_iota == 3))
            ).astype(jnp.float32)

            state[...] = jnp.zeros_like(state)

            def get_dma(slot, i):
                return pltpu.make_async_copy(
                    grid_ref.at[
                        tab_ref[0, i + 1, 0],
                        pl.ds(tab_ref[0, i + 1, 1], pu),
                        pl.ds(pl.multiple_of(tab_ref[0, i + 1, 2], 8), pv),
                        :,
                    ],
                    patch.at[slot],
                    sem.at[slot],
                )

            @pl.when(count > 0)
            def _():
                get_dma(0, 0).start()

            def fold_plane(ch):
                """[R, 32] channels -> (sigma_raw [R], rgbraw [R, 3])."""
                if "fold" not in parts:
                    return ch[:, NF], ch[:, 0:3]
                chy = ch * ytile
                if fold_mode == "matmul":
                    f = jnp.dot(chy, sel, preferred_element_type=jnp.float32)
                    return f[:, 3], f[:, 0:3]
                # roll: sum of 9 consecutive lanes = dyadic sum8 + 1 extra
                s = chy + pltpu.roll(chy, shift=LANES - 1, axis=1)
                s = s + pltpu.roll(s, shift=LANES - 2, axis=1)
                s = s + pltpu.roll(s, shift=LANES - 4, axis=1)
                s9 = s + pltpu.roll(chy, shift=LANES - 8, axis=1)
                rgb = jnp.concatenate(
                    [s9[:, 0:1], s9[:, 9:10], s9[:, 18:19]], axis=1
                )
                return ch[:, NF], rgb

            def group_body(carry):
                i, T_in = carry
                xg = tab_ref[0, i + 1, 0]
                u0f = tab_ref[0, i + 1, 1].astype(jnp.float32)
                v0f = tab_ref[0, i + 1, 2].astype(jnp.float32)
                slot = jax.lax.rem(i, 2)

                if "dma" in parts:
                    @pl.when(i + 1 < count)
                    def _():
                        get_dma(jax.lax.rem(i + 1, 2), i + 1).start()

                    get_dma(slot, i).wait()
                B = patch[slot].reshape(rows, LAN)

                # plane/slab index of lane-block k of this entry
                if composite == "analytic":
                    jg3 = (xg * (GS - 1)).astype(jnp.float32) + ks3
                else:
                    jg3 = xg.astype(jnp.float32) * GS + ks3
                u3 = au[None, :, None] + bu[None, :, None] * jg3
                v3 = av[None, :, None] + bv[None, :, None] * jg3
                live3 = (jg3 >= jmin[None, :, None]) & (
                    jg3 <= jmax[None, :, None]
                )
                if w_mode == "full":
                    u3 = u3 - u0f
                    v3 = v3 - v0f
                    du = (u3 - uq3).astype(jnp.bfloat16)
                    dv = (v3 - vq3).astype(jnp.bfloat16)
                    one = jnp.bfloat16(1.0)
                    zero = jnp.bfloat16(0.0)
                    wu = jnp.maximum(zero, one - jnp.abs(du))
                    wv = jnp.maximum(zero, one - jnp.abs(dv))
                    wu = jnp.where(live3, wu, zero)
                    W = (wu * wv).reshape(GS * R, rows)
                else:  # lean: push liveness into the coordinate (tent -> 0)
                    u3 = jnp.where(live3, u3 - u0f, jnp.float32(-2.0))
                    v3 = v3 - v0f
                    one = jnp.bfloat16(1.0)
                    zero = jnp.bfloat16(0.0)
                    wu = jnp.maximum(zero, one - jnp.abs((u3 - uq3).astype(jnp.bfloat16)))
                    wv = jnp.maximum(zero, one - jnp.abs((v3 - vq3).astype(jnp.bfloat16)))
                    W = (wu * wv).reshape(GS * R, rows)
                if "w" not in parts:
                    # static W (keeps the matmul, drops the tent build)
                    W = (
                        jax.lax.broadcasted_iota(
                            jnp.int32, (GS * R, rows), 1
                        ) % 7
                    ).astype(jnp.bfloat16) * jnp.bfloat16(0.01)
                if "matmul" in parts:
                    interp = jnp.dot(W, B, preferred_element_type=jnp.float32)
                else:
                    # keep W and the patch alive without the MXU pass
                    interp = jnp.concatenate(
                        [W[:, :LAN].astype(jnp.float32)] , axis=1
                    ) + B[0:1, :].astype(jnp.float32)

                T_cur = T_in
                col_acc = jnp.zeros((R, 3), jnp.float32)
                acc_acc = jnp.zeros((R, 1), jnp.float32)
                dep_acc = jnp.zeros((R, 1), jnp.float32)

                if "acc" not in parts:
                    # keep interp alive, skip the alpha/sigmoid composite
                    state[...] += interp[:R, 0:8]
                    return i + 1, T_in
                if composite == "sample":
                    base = xg.astype(jnp.float32) * GS
                    for b in range(GS):
                        ch = interp[b * R:(b + 1) * R,
                                    b * LANES:(b + 1) * LANES]
                        sigma, rgbraw = fold_plane(ch)
                        if relu_sigma:
                            sigma = jnp.maximum(sigma, 0.0)
                        alpha = jnp.clip(1.0 - jnp.exp(-sigma * delta), 0.0, 1.0)
                        w = alpha * T_cur
                        s_dep = at + bt * (base + b)
                        col_acc = col_acc + jax.nn.sigmoid(rgbraw) * w[:, None]
                        acc_acc = acc_acc + w[:, None]
                        dep_acc = dep_acc + (w * s_dep)[:, None]
                        T_cur = T_cur * (1.0 - alpha)
                else:  # analytic plane march
                    base = (xg * (GS - 1)).astype(jnp.float32)
                    planes = []
                    for b in range(GS):
                        ch = interp[b * R:(b + 1) * R,
                                    b * LANES:(b + 1) * LANES]
                        planes.append(fold_plane(ch))
                    for c in range(GS - 1):
                        a_s, a_rgb = planes[c]
                        b_s, b_rgb = planes[c + 1]
                        if relu_sigma:
                            p = jnp.maximum(a_s, 0.0)
                            q = jnp.maximum(b_s, 0.0)
                            s_ab = a_s - b_s
                            safe = jnp.where(
                                jnp.abs(s_ab) > 1e-6, s_ab, jnp.float32(1.0)
                            )
                            integ = jnp.where(
                                jnp.abs(s_ab) > 1e-6,
                                (p * p - q * q) / (2.0 * safe),
                                0.5 * (p + q),
                            )
                        else:
                            integ = jnp.maximum(0.5 * (a_s + b_s), 0.0)
                        alpha = jnp.clip(
                            1.0 - jnp.exp(-integ * delta), 0.0, 1.0
                        )
                        w = alpha * T_cur
                        mid = jax.nn.sigmoid(0.5 * (a_rgb + b_rgb))
                        s_dep = at + bt * (base + c + 0.5)
                        col_acc = col_acc + mid * w[:, None]
                        acc_acc = acc_acc + w[:, None]
                        dep_acc = dep_acc + (w * s_dep)[:, None]
                        T_cur = T_cur * (1.0 - alpha)

                state[...] += jnp.concatenate(
                    [col_acc, acc_acc, dep_acc, jnp.zeros((R, 3), jnp.float32)],
                    axis=1,
                )
                return i + 1, T_cur

            def group_cond(carry):
                i, T_cur = carry
                return i < count

            jax.lax.while_loop(
                group_cond, group_body, (0, jnp.ones((R,), jnp.float32))
            )
            out_ref[0] = state[...]

        pl.run_scoped(
            body,
            patch=pltpu.VMEM((2, pu, pv, LAN), jnp.bfloat16),
            state=pltpu.VMEM((R, 8), jnp.float32),
            sem=pltpu.SemaphoreType.DMA((2,)),
        )

    return kernel


def run_variant(name, pu, pv, w_mode, fold_mode, composite, n_tiles=64,
                n_groups=24, xg=32, u=144, v=144,
                parts=("dma", "w", "matmul", "fold", "acc")):
    kernel = make_kernel(pu, pv, w_mode, fold_mode, composite, parts=parts)
    rng = np.random.default_rng(0)
    grid = jnp.asarray(
        rng.normal(size=(xg, u, v, LAN)).astype(np.float32), jnp.bfloat16
    ) * 0.05

    # dense tables: every tile visits groups 0..n_groups-1 with random patch anchors
    tabs = np.zeros((n_tiles, n_groups + 1, 4), np.int32)
    tabs[:, 0, 0] = n_groups
    tabs[:, 1:, 0] = np.arange(n_groups)[None, :] % xg
    tabs[:, 1:, 1] = rng.integers(0, u - pu, size=(n_tiles, n_groups))
    tabs[:, 1:, 2] = (rng.integers(0, (v - pv) // 8, size=(n_tiles, n_groups))) * 8

    rays = np.zeros((n_tiles, R, 48), np.float32)
    rays[..., 0] = rng.uniform(20, 100, size=(n_tiles, R))  # au
    rays[..., 1] = rng.uniform(-0.4, 0.4, size=(n_tiles, R))  # bu
    rays[..., 2] = rng.uniform(20, 100, size=(n_tiles, R))  # av
    rays[..., 3] = rng.uniform(-0.4, 0.4, size=(n_tiles, R))  # bv
    rays[..., 4] = 2.0
    rays[..., 5] = 0.02
    rays[..., 6] = 0.0  # jmin
    rays[..., 7] = 1e9  # jmax
    rays[..., 8] = 0.05  # delta
    rays[..., 16:48] = rng.normal(size=(n_tiles, R, 32)) * 0.3
    tabs = jnp.asarray(tabs)
    rays = jnp.asarray(rays)

    @jax.jit
    def run(tabs, rays, grid):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((1, n_groups + 1, 4), lambda t: (t, 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, R, 48), lambda t: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, R, 8), lambda t: (t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, R, 8), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
        )(tabs, rays, grid)

    def sync(x):
        return float(jnp.sum(x))

    out = run(tabs, rays, grid)
    sync(out)
    # warm until stable
    best = 1e9
    miss = 0
    while miss < 2:
        t0 = time.perf_counter()
        for _ in range(8):
            out = run(tabs, rays, grid)
        sync(out)
        dt = (time.perf_counter() - t0) / 8
        if dt < 0.97 * best:
            best, miss = dt, 0
        else:
            best, miss = min(best, dt), miss + 1
    entries = n_tiles * n_groups
    per_entry_us = best * 1e6 / entries
    interps = entries * GS * R
    cells = entries * ((GS - 1) if composite == "analytic" else GS) * R
    print(
        f"{name:34s} rows={pu*pv:4d} {per_entry_us:6.2f} us/entry  "
        f"{interps/best/1e9:6.3f} G interp/s  {cells/best/1e9:6.3f} G cells/s  "
        f"checksum {sync(out):.1f}",
        flush=True,
    )


if __name__ == "__main__":
    import sys as _sys
    which = _sys.argv[1] if len(_sys.argv) > 1 else "all"
    if which in ("all", "variants"):
        run_variant("A round-2 replica", 24, 32, "full", "matmul", "sample")
        run_variant("B small patch", 16, 24, "full", "matmul", "sample")
        run_variant("F analytic + matmul fold", 16, 24, "lean", "matmul",
                    "analytic")
    if which in ("all", "parts"):
        ALL = ("dma", "w", "matmul", "fold", "acc")
        for drop in ("dma", "w", "matmul", "fold", "acc"):
            parts = tuple(p for p in ALL if p != drop)
            run_variant(f"B minus {drop}", 16, 24, "full", "matmul", "sample",
                        parts=parts)
        run_variant("B dma only", 16, 24, "full", "matmul", "sample",
                    parts=("dma",))
        run_variant("B matmul only", 16, 24, "full", "matmul", "sample",
                    parts=("matmul",))
