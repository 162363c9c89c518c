"""Probe the exact mechanics of the slab-march kernel design (v2 after probe findings).

Layout decisions under test:
  grid HBM [XG, U, V, 128] bf16   (XG = x-cell-slabs/4, 128 lanes = 4 slabs x 32 ch)
  patch DMA [16, 24, 128] at (xg dyn, u0 dyn-arbitrary, v0 8-aligned)
  in-kernel reshape [16,24,128] -> [384,128]
  one-hot W [256,384] bf16 @ patch [384,128] bf16 -> f32, static lane slice per slab
  while_loop over groups with DMA inside + early exit

Prints correctness + a samples/s rate for the full inner loop.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

XG, U, V = 32, 130, 136
R = 256  # rays per tile
PU, PV = 16, 24
ROWS = PU * PV  # 384


def make_kernel(n_groups):
    def kernel(tab_ref, rays_ref, grid_ref, out_ref):
        # tab_ref: SMEM [n_groups, 4] int32 (xg, u0, v0, skip) for THIS tile
        # rays_ref: VMEM [R, 48] f32: au,bu,av,bv,at,bt,kmin,kmax, 8 pad, y_tiled[32]
        def body(patch, state, sem):
            # static selector: Su[u, r] = 1 iff r // PV == u  (expands wu to row index)
            r_iota = jax.lax.broadcasted_iota(jnp.int32, (PU, ROWS), 1)
            u_of_r = r_iota // PV
            su = (u_of_r == jax.lax.broadcasted_iota(jnp.int32, (PU, ROWS), 0)).astype(
                jnp.bfloat16
            )

            au = rays_ref[0, :, 0]
            bu = rays_ref[0, :, 1]
            av = rays_ref[0, :, 2]
            bv = rays_ref[0, :, 3]
            bt = rays_ref[0, :, 5]
            kmin = rays_ref[0, :, 6]
            kmax = rays_ref[0, :, 7]
            ytile = rays_ref[0, :, 16:48]  # [R, 32]

            # static channel-fold selector: col j sums lanes [8j, 8j+8)
            c_iota = jax.lax.broadcasted_iota(jnp.int32, (32, 8), 0)
            j_iota = jax.lax.broadcasted_iota(jnp.int32, (32, 8), 1)
            sel = (c_iota // 8 == j_iota).astype(jnp.float32)

            state[...] = jnp.zeros_like(state)

            def group_body(carry):
                g, T = carry
                xg = tab_ref[0, g, 0]
                u0 = tab_ref[0, g, 1]
                v0 = pl.multiple_of(tab_ref[0, g, 2], 8)
                skip = tab_ref[0, g, 3]

                @pl.when(skip == 0)
                def _():
                    dma = pltpu.make_async_copy(
                        grid_ref.at[xg, pl.ds(u0, PU), pl.ds(v0, PV), :],
                        patch,
                        sem,
                    )
                    dma.start()
                    dma.wait()

                def do_group(T_in):
                    B = patch[...].reshape(ROWS, 128)
                    u0f = u0.astype(jnp.float32)
                    v0f = v0.astype(jnp.float32)
                    T_cur = T_in
                    col_acc = jnp.zeros((R, 3), jnp.float32)
                    w_acc = jnp.zeros((R, 1), jnp.float32)
                    for k in range(4):
                        kf = (g * 4 + k).astype(jnp.float32)
                        u = au + bu * kf - u0f
                        v = av + bv * kf - v0f
                        iu = jnp.floor(u)
                        iv = jnp.floor(v)
                        fu = (u - iu)[:, None]
                        fv = (v - iv)[:, None]
                        iui = iu.astype(jnp.int32)[:, None]
                        ivi = iv.astype(jnp.int32)[:, None]
                        u_iota = jax.lax.broadcasted_iota(jnp.int32, (R, PU), 1)
                        v_iota = jax.lax.broadcasted_iota(jnp.int32, (R, PV), 1)
                        wu = jnp.where(u_iota == iui, 1.0 - fu, 0.0) + jnp.where(
                            u_iota == iui + 1, fu, 0.0
                        )
                        wv = jnp.where(v_iota == ivi, 1.0 - fv, 0.0) + jnp.where(
                            v_iota == ivi + 1, fv, 0.0
                        )
                        live = (kf >= kmin) & (kf <= kmax)
                        wu = jnp.where(live[:, None], wu, 0.0)
                        # W[n, r] = wu[n, r // PV] * wv[n, r % PV], built 2-D natively:
                        wu_exp = jnp.dot(
                            wu.astype(jnp.bfloat16), su, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)  # [R, ROWS]
                        wv_til = jnp.concatenate([wv.astype(jnp.bfloat16)] * PU, axis=1)
                        W = wu_exp * wv_til
                        interp = jnp.dot(
                            W,
                            B,
                            preferred_element_type=jnp.float32,
                        )  # [R, 128]
                        ch = interp[:, k * 32 : (k + 1) * 32]  # static lane slice
                        rgbraw = jnp.dot(
                            ch * ytile, sel, preferred_element_type=jnp.float32
                        )  # [R, 8]
                        sigma = jnp.maximum(ch[:, 27], 0.0)
                        alpha = 1.0 - jnp.exp(-sigma * bt)
                        w = alpha * T_cur
                        col_acc = col_acc + jax.nn.sigmoid(rgbraw[:, :3]) * w[:, None]
                        w_acc = w_acc + w[:, None]
                        T_cur = T_cur * (1.0 - alpha)
                    contrib = jnp.concatenate(
                        [col_acc, w_acc, jnp.zeros((R, 4), jnp.float32)], axis=1
                    )
                    return T_cur, contrib

                T_out, contrib = jax.lax.cond(
                    skip == 0,
                    do_group,
                    lambda t: (t, jnp.zeros((R, 8), jnp.float32)),
                    T,
                )
                state[...] += contrib
                return g + 1, T_out

            def group_cond(carry):
                g, T = carry
                return (g < n_groups) & (jnp.max(T) > 1e-4)

            jax.lax.while_loop(group_cond, group_body, (0, jnp.ones((R,), jnp.float32)))
            out_ref[0] = state[...]

        pl.run_scoped(
            body,
            patch=pltpu.VMEM((PU, PV, 128), jnp.bfloat16),
            state=pltpu.VMEM((R, 8), jnp.float32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    return kernel


def run_probe(n_tiles=64, n_groups=32, skip_frac=0.0):
    kernel = make_kernel(n_groups)

    @jax.jit
    def run(tabs, rays, grid):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (1, n_groups, 4),
                    lambda t: (t, 0, 0),
                    memory_space=pltpu.SMEM,
                ),
                pl.BlockSpec((1, R, 48), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, R, 8), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles, R, 8), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
        )(tabs, rays, grid)

    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    tabs = np.zeros((n_tiles, n_groups, 4), np.int32)
    tabs[..., 0] = rng.integers(0, XG, (n_tiles, n_groups))
    tabs[..., 1] = rng.integers(0, U - PU, (n_tiles, n_groups))
    tabs[..., 2] = rng.integers(0, (V - PV) // 8, (n_tiles, n_groups)) * 8
    tabs[..., 3] = (rng.random((n_tiles, n_groups)) < skip_frac).astype(np.int32)
    rays = np.zeros((n_tiles, R, 48), np.float32)
    rays[..., 0] = rng.uniform(2, 12, (n_tiles, R))  # au (patch coords ~small)
    rays[..., 1] = 0.02
    rays[..., 2] = rng.uniform(2, 18, (n_tiles, R))
    rays[..., 3] = 0.03
    rays[..., 5] = 0.02  # bt (delta)
    rays[..., 6] = 0.0
    rays[..., 7] = 1e9
    rays[..., 16:48] = rng.standard_normal((n_tiles, R, 32)) * 0.1
    grid = jax.random.normal(key, (XG, U, V, 128)).astype(jnp.bfloat16) * 0.05

    tabs, rays = jnp.asarray(tabs), jnp.asarray(rays)

    def sync(x):
        return float(jnp.sum(x))  # scalar transfer forces real completion (axon tunnel)

    out = run(tabs, rays, grid)
    sync(out)
    # warm until stable (deferred AOT can run a deopt executable at first)
    for _ in range(6):
        t0 = time.perf_counter()
        out = run(tabs, rays, grid)
        sync(out)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out = run(tabs, rays, grid)
    sync(out)
    dt = (time.perf_counter() - t0) / n
    active = 1.0 - skip_frac
    samples = n_tiles * n_groups * 4 * R * active
    print(
        f"slab-kernel probe (tiles={n_tiles}, groups={n_groups}, skip={skip_frac}):"
        f" {dt*1e3:.2f} ms -> {samples/dt/1e9:.3f} G active samples/s"
        f" ({n_tiles*R*4*n_groups/dt/1e6:.1f} M sample-slots/s)"
    )
    return out


if __name__ == "__main__":
    try:
        run_probe(n_tiles=64, n_groups=32, skip_frac=0.0)
        run_probe(n_tiles=64, n_groups=32, skip_frac=0.75)
        run_probe(n_tiles=625, n_groups=32, skip_frac=0.8)
    except Exception as e:
        s = str(e)
        i = s.find("Mosaic")
        print("FAIL:", s[i : i + 600] if i >= 0 else s[:600])
