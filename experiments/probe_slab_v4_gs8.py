import sys, time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GS = 8
XG, U, V = 16, 130, 136     # 128 slabs / 8
R = 256
PU, PV = 16, 24
ROWS = PU * PV
n_tiles, n_groups = 64, 16  # same total slabs as before
LAN = GS * 32

def kernel(tab_ref, rays_ref, grid_ref, out_ref):
    def body(patch, state, sem):
        au = rays_ref[0, :, 0]; bu = rays_ref[0, :, 1]
        av = rays_ref[0, :, 2]; bv = rays_ref[0, :, 3]
        bt = rays_ref[0, :, 5]
        ytile = rays_ref[0, :, 16:48]
        ks3 = jax.lax.broadcasted_iota(jnp.int32, (GS, R, 1), 0).astype(jnp.float32)
        au3 = au[None, :, None] + bu[None, :, None] * ks3
        av3 = av[None, :, None] + bv[None, :, None] * ks3
        bu3 = jnp.broadcast_to(bu[None, :, None] * GS, (GS, R, 1))
        bv3 = jnp.broadcast_to(bv[None, :, None] * GS, (GS, R, 1))
        uq3 = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, ROWS), 2) // PV).astype(jnp.float32)
        vq3 = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, ROWS), 2) % PV).astype(jnp.float32)
        c_iota = jax.lax.broadcasted_iota(jnp.int32, (32, 8), 0)
        j_iota = jax.lax.broadcasted_iota(jnp.int32, (32, 8), 1)
        sel = (c_iota // 8 == j_iota).astype(jnp.float32)
        state[...] = jnp.zeros_like(state)

        def get_dma(slot, g):
            return pltpu.make_async_copy(
                grid_ref.at[tab_ref[0, g, 0],
                            pl.ds(tab_ref[0, g, 1], PU),
                            pl.ds(pl.multiple_of(tab_ref[0, g, 2], 8), PV), :],
                patch.at[slot], sem.at[slot])

        get_dma(0, 0).start()

        def group_body(carry):
            g, T = carry
            u0f = tab_ref[0, g, 1].astype(jnp.float32)
            v0f = tab_ref[0, g, 2].astype(jnp.float32)
            gf = g.astype(jnp.float32)
            slot = jax.lax.rem(g, 2)
            @pl.when(g + 1 < n_groups)
            def _():
                get_dma(jax.lax.rem(g + 1, 2), g + 1).start()
            get_dma(slot, g).wait()
            B = patch[slot].reshape(ROWS, LAN)

            u3 = au3 + bu3 * gf - u0f
            v3 = av3 + bv3 * gf - v0f
            du = (u3 - uq3).astype(jnp.bfloat16)
            dv = (v3 - vq3).astype(jnp.bfloat16)
            one = jnp.bfloat16(1.0); zero = jnp.bfloat16(0.0)
            wu = jnp.maximum(zero, one - jnp.abs(du))
            wv = jnp.maximum(zero, one - jnp.abs(dv))
            W = (wu * wv).reshape(GS * R, ROWS)
            interp = jnp.dot(W, B, preferred_element_type=jnp.float32)  # [GS*R, LAN]

            T_cur = T
            col_acc = jnp.zeros((R, 3), jnp.float32)
            w_acc = jnp.zeros((R, 1), jnp.float32)
            for k in range(GS):
                ch = interp[k * R:(k + 1) * R, k * 32:(k + 1) * 32]
                rgbraw = jnp.dot(ch * ytile, sel, preferred_element_type=jnp.float32)
                sigma = jnp.maximum(ch[:, 27], 0.0)
                alpha = 1.0 - jnp.exp(-sigma * bt)
                w = alpha * T_cur
                col_acc = col_acc + jax.nn.sigmoid(rgbraw[:, :3]) * w[:, None]
                w_acc = w_acc + w[:, None]
                T_cur = T_cur * (1.0 - alpha)
            state[...] += jnp.concatenate(
                [col_acc, w_acc, jnp.zeros((R, 4), jnp.float32)], axis=1)
            return g + 1, T_cur

        jax.lax.while_loop(lambda c: c[0] < n_groups, group_body,
                           (0, jnp.ones((R,), jnp.float32)))
        out_ref[0] = state[...]
    pl.run_scoped(body,
        patch=pltpu.VMEM((2, PU, PV, LAN), jnp.bfloat16),
        state=pltpu.VMEM((R, 8), jnp.float32),
        sem=pltpu.SemaphoreType.DMA((2,)))

@jax.jit
def run(tabs, rays, grid):
    return pl.pallas_call(kernel, grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, n_groups, 4), lambda t: (t, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, R, 48), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, R, 8), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_tiles, R, 8), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )(tabs, rays, grid)

rng = np.random.default_rng(0)
tabs = np.zeros((n_tiles, n_groups, 4), np.int32)
tabs[..., 0] = rng.integers(0, XG, (n_tiles, n_groups))
tabs[..., 1] = rng.integers(0, U - PU, (n_tiles, n_groups))
tabs[..., 2] = rng.integers(0, (V - PV) // 8, (n_tiles, n_groups)) * 8
rays = np.zeros((n_tiles, R, 48), np.float32)
rays[..., 0] = rng.uniform(2, 12, (n_tiles, R)); rays[..., 1] = 0.02
rays[..., 2] = rng.uniform(2, 18, (n_tiles, R)); rays[..., 3] = 0.03
rays[..., 5] = 0.02
rays[..., 16:48] = rng.standard_normal((n_tiles, R, 32)) * 0.1
grid = jax.random.normal(jax.random.PRNGKey(0), (XG, U, V, LAN)).astype(jnp.bfloat16) * 0.05
tabs, rays = jnp.asarray(tabs), jnp.asarray(rays)
def sync(x): return float(jnp.sum(x))
out = run(tabs, rays, grid); sync(out)
for _ in range(6):
    out = run(tabs, rays, grid); sync(out)
n = 10
t0 = time.perf_counter()
for _ in range(n):
    out = run(tabs, rays, grid)
sync(out)
dt = (time.perf_counter() - t0) / n
samples = n_tiles * n_groups * GS * R
print(f"v4 GS=8: {dt*1e3:7.2f} ms  {samples/dt/1e9:.3f} G samples/s")
