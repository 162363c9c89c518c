"""Probe the Pallas mechanics the slab-march kernel design depends on.

Run on the attached TPU. Each probe prints PASS/FAIL + a rate where meaningful.
Findings feed DESIGN_NOTES.md and decide the kernel architecture:

  P1: VMEM->VMEM make_async_copy with dynamic (sublane, middle-dim) offsets.
  P2: lane-dim dynamic slice read at 128/256-multiple offsets.
  P3: read-modify-write accumulate at dynamic sublane offsets (rank-3 view).
  P4: HBM group-patch DMA (4-D strided, dynamic offsets) issue rate.
  P5: core one-hot bilinear matmul + composite chain throughput (no DMA).
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timed(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n, out


# ---------------------------------------------------------------- P1: VMEM->VMEM dyn DMA
def probe_p1():
    U, V, C = 130, 136, 32
    PU, PV = 16, 24

    def kernel(slab_ref, off_ref, out_ref):
        def body(patch, sem):
            u0, v0 = off_ref[0], off_ref[1]
            dma = pltpu.make_async_copy(
                slab_ref.at[pl.ds(u0, PU), pl.ds(v0, PV), :], patch, sem
            )
            dma.start()
            dma.wait()
            out_ref[...] = patch[...]

        pl.run_scoped(
            body,
            patch=pltpu.VMEM((PU, PV, C), jnp.float32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    @jax.jit
    def run(slab, off):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((PU, PV, C), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(slab, off)

    slab = jnp.arange(U * V * C, dtype=jnp.float32).reshape(U, V, C)
    off = jnp.array([37, 51], jnp.int32)
    try:
        got = run(slab, off)
        want = slab[37 : 37 + PU, 51 : 51 + PV, :]
        ok = bool(jnp.allclose(got, want))
        print(f"P1 vmem->vmem dyn-offset DMA: {'PASS' if ok else 'WRONG'}")
        return ok
    except Exception as e:
        print(f"P1 vmem->vmem dyn-offset DMA: FAIL ({str(e)[:120]})")
        return False


# ---------------------------------------------------------------- P2: lane-dim dyn slice
def probe_p2():
    U, L = 130, 4352  # [u, v*c] with c=32

    def kernel(slab_ref, off_ref, out_ref):
        u0, v0 = off_ref[0], off_ref[1]
        out_ref[...] = slab_ref[pl.ds(u0, 16), pl.ds(v0 * 32, 768)]

    @jax.jit
    def run(slab, off):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((16, 768), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(slab, off)

    slab = jnp.arange(U * L, dtype=jnp.float32).reshape(U, L)
    off = jnp.array([37, 8], jnp.int32)  # lane offset 8*32=256
    try:
        got = run(slab, off)
        want = slab[37:53, 256 : 256 + 768]
        ok = bool(jnp.allclose(got, want))
        print(f"P2 lane-dim dyn slice (256-mult): {'PASS' if ok else 'WRONG'}")
        return ok
    except Exception as e:
        print(f"P2 lane-dim dyn slice: FAIL ({str(e)[:120]})")
        return False


# ---------------------------------------------------------------- P3: dyn-offset accumulate
def probe_p3():
    U, B, L = 130, 17, 256  # [u, v_block, 8*32]

    def kernel(patch_ref, off_ref, acc_ref):
        @pl.when(pl.program_id(0) == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        u0, vb = off_ref[0], off_ref[1]
        acc_ref[pl.ds(u0, 16), pl.ds(vb, 3), :] += patch_ref[...]

    @jax.jit
    def run(patch, off):
        return pl.pallas_call(
            kernel,
            grid=(4,),
            in_specs=[
                pl.BlockSpec((16, 3, L), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((U, B, L), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((U, B, L), jnp.float32),
        )(patch, off)

    patch = jnp.ones((16, 3, L), jnp.float32)
    off = jnp.array([37, 5], jnp.int32)
    try:
        got = run(patch, off)
        want = jnp.zeros((U, B, L)).at[37:53, 5:8, :].add(4.0)
        ok = bool(jnp.allclose(got, want))
        print(f"P3 dyn-offset accumulate: {'PASS' if ok else 'WRONG'}")
        return ok
    except Exception as e:
        print(f"P3 dyn-offset accumulate: FAIL ({str(e)[:120]})")
        return False


# ---------------------------------------------------------------- P5: core compute chain
def probe_p5(n_tiles=64, n_groups=16, slabs_per_group=8):
    """Tile-outer march: per (tile, group, slab): build W [256, 384] one-hot from
    per-ray linear (u,v) coeffs, matmul against a VMEM patch [384, 32], SH-dot,
    composite. Patch held static (no DMA) - this is the pure compute ceiling."""
    R = 256  # rays per tile
    ROWS, C = 384, 32  # 16u x 24v patch rows

    def kernel(rays_ref, patch_ref, out_ref):
        t = pl.program_id(0)

        def body(state_ref):
            state_ref[...] = jnp.zeros_like(state_ref)

            au = rays_ref[:, 0]
            bu = rays_ref[:, 1]
            av = rays_ref[:, 2]
            bv = rays_ref[:, 3]
            ytile = rays_ref[:, 8:40]  # [R, 32] per-ray SH basis (tiled)

            def slab_step(s, carry):
                k = s.astype(jnp.float32)
                u = au + bu * k  # [R] patch-local u
                v = av + bv * k
                u0 = jnp.floor(u)
                v0 = jnp.floor(v)
                fu = (u - u0)[:, None]
                fv = (v - v0)[:, None]
                iu = u0.astype(jnp.int32)
                iv = v0.astype(jnp.int32)
                u_iota = jax.lax.broadcasted_iota(jnp.int32, (R, 16), 1)
                v_iota = jax.lax.broadcasted_iota(jnp.int32, (R, 24), 1)
                wu = jnp.where(u_iota == iu[:, None], 1.0 - fu, 0.0) + jnp.where(
                    u_iota == iu[:, None] + 1, fu, 0.0
                )
                wv = jnp.where(v_iota == iv[:, None], 1.0 - fv, 0.0) + jnp.where(
                    v_iota == iv[:, None] + 1, fv, 0.0
                )
                W = (wu[:, :, None] * wv[:, None, :]).reshape(R, ROWS)
                interp = jnp.dot(
                    W.astype(jnp.bfloat16),
                    patch_ref[...],
                    preferred_element_type=jnp.float32,
                )  # [R, 32]
                rgbraw = jnp.sum(
                    (interp * ytile).reshape(R, 4, 8), axis=-1
                )  # fake SH fold: [R, 4]
                sigma = jnp.maximum(interp[:, 27], 0.0)
                alpha = 1.0 - jnp.exp(-sigma * 0.01)
                T = carry
                w = alpha * T
                contrib = jnp.concatenate(
                    [jax.nn.sigmoid(rgbraw[:, :3]) * w[:, None], w[:, None]], axis=-1
                )
                state_ref[:, :4] += contrib
                return T * (1.0 - alpha)

            jax.lax.fori_loop(
                0, n_groups * slabs_per_group, slab_step, jnp.ones((R,), jnp.float32)
            )
            out_ref[...] = state_ref[...]

        pl.run_scoped(body, state_ref=pltpu.VMEM((R, 8), jnp.float32))

    @jax.jit
    def run(rays, patch):
        return pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((R, 40), lambda t: (t, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS, C), lambda t: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, 8), lambda t: (t, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_tiles * R, 8), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
        )(rays, patch)

    key = jax.random.PRNGKey(0)
    rays = jax.random.uniform(key, (n_tiles * R, 40), minval=2.0, maxval=10.0)
    rays = rays.at[:, 1].set(0.02).at[:, 3].set(0.03)
    patch = jax.random.normal(key, (ROWS, C)).astype(jnp.bfloat16)
    try:
        dt, _ = timed(run, rays, patch, n=10)
        samples = n_tiles * R * n_groups * slabs_per_group
        print(
            f"P5 core chain: PASS  {dt*1e3:.2f} ms for {samples/1e6:.1f}M samples"
            f" -> {samples/dt/1e9:.2f} G samples/s"
        )
        return True
    except Exception as e:
        print(f"P5 core chain: FAIL ({str(e)[:300]})")
        return False


# ---------------------------------------------------------------- P4: HBM group-patch DMA
def probe_p4(n_patches=2048):
    """Rate of 4-D strided dynamic-offset HBM->VMEM patch DMAs: [8, 16, 24, 32] bf16
    (the per-(tile, slab-group) fetch of the march kernel), double-buffered."""
    X, U, V, C = 128, 130, 136, 32
    GS, PU, PV = 8, 16, 24

    def kernel(offs_ref, grid_ref, out_ref):
        def body(patch, sem):
            def get_dma(slot, i):
                return pltpu.make_async_copy(
                    grid_ref.at[
                        pl.ds(offs_ref[i, 0], GS),
                        pl.ds(offs_ref[i, 1], PU),
                        pl.ds(offs_ref[i, 2], PV),
                        :,
                    ],
                    patch.at[slot],
                    sem.at[slot],
                )

            get_dma(0, 0).start()

            def loop(i, acc):
                slot = i % 2

                @pl.when(i + 1 < n_patches)
                def _():
                    get_dma((i + 1) % 2, i + 1).start()

                get_dma(slot, i).wait()
                return acc + patch[slot, 0, 0, 0, 0].astype(jnp.float32)

            acc = jax.lax.fori_loop(0, n_patches, loop, 0.0)
            out_ref[0, 0] = acc

        pl.run_scoped(
            body,
            patch=pltpu.VMEM((2, GS, PU, PV, C), jnp.bfloat16),
            sem=pltpu.SemaphoreType.DMA((2,)),
        )

    @jax.jit
    def run(offs, grid):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        )(offs, grid)

    key = jax.random.PRNGKey(1)
    offs = jnp.stack(
        [
            jax.random.randint(key, (n_patches,), 0, X - GS),
            jax.random.randint(key, (n_patches,), 0, U - PU),
            jax.random.randint(key, (n_patches,), 0, V - PV),
        ],
        axis=-1,
    ).astype(jnp.int32)
    grid = jnp.ones((X, U, V, C), jnp.bfloat16)
    try:
        dt, _ = timed(run, offs, grid, n=10)
        nbytes = n_patches * GS * PU * PV * C * 2
        print(
            f"P4 HBM group-patch DMA: PASS  {dt*1e3:.2f} ms for {n_patches} patches"
            f" -> {n_patches/dt/1e3:.0f}K patches/s, {nbytes/dt/1e9:.1f} GB/s"
        )
        return True
    except Exception as e:
        print(f"P4 HBM group-patch DMA: FAIL ({str(e)[:300]})")
        return False


if __name__ == "__main__":
    probe_p1()
    probe_p2()
    probe_p3()
    probe_p4()
    probe_p5()
