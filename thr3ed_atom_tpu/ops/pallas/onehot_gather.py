"""Pallas TPU kernel: weighted row gather as an MXU one-hot matmul.

STATUS: the measured prototype that motivated the production kernel. The
production integration of this primitive is ``ops/pallas/slab_march.py`` (the
fused slab-march renderer: tent-product weight build + one MXU matmul per
(tile, slab-group) patch); this standalone version remains as the tested
primitive + microbenchmark for VMEM-resident table gathers.

Why: random row gather on TPU runs on the scalar/DMA path (~50-100M rows/s measured,
independent of arithmetic throughput). When the table is small enough to live in VMEM
(bricks of a spatially partitioned voxel grid, codebooks, palettes), the gather+reduce

    out[n] = sum_k weights[n, k] * table[indices[n, k]]

can instead be computed on the MXU as ``W @ table`` where ``W`` is the [N, B] sparse
weight matrix materialized one tile at a time in VMEM — never touching HBM. This is the
core primitive of the brick-partitioned fused ray-march kernel (a sample's 8 trilinear
corner taps inside a brick are exactly K=8 weighted rows).

The kernel tiles N; the table is resident in VMEM for all grid steps. A custom VJP
implements both cotangents with the same MXU pattern (d_table = W^T @ g via a second
kernel; d_weights via the plain gather kernel + a row dot).
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tile of gather rows processed per grid step
_TILE_N = 256


def _weighted_gather_kernel(idx_ref, w_ref, table_ref, out_ref):
    """out[tile] = sum_k where(iota == idx_k, w_k, 0) @ table."""
    B = table_ref.shape[0]
    K = idx_ref.shape[1]
    n = idx_ref.shape[0]

    b_iota = jax.lax.broadcasted_iota(jnp.int32, (n, B), 1)
    weight_matrix = jnp.zeros((n, B), dtype=w_ref.dtype)
    for k in range(K):  # K is small (8 for trilinear corners); unrolled
        weight_matrix = weight_matrix + jnp.where(
            b_iota == idx_ref[:, k][:, None], w_ref[:, k][:, None], 0.0
        )
    out_ref[...] = jnp.dot(
        weight_matrix, table_ref[...], preferred_element_type=jnp.float32
    )


def _scatter_add_kernel(idx_ref, w_ref, g_ref, out_ref):
    """out += W^T @ g accumulated across grid steps (d_table cotangent)."""
    B = out_ref.shape[0]
    K = idx_ref.shape[1]
    n = idx_ref.shape[0]

    b_iota = jax.lax.broadcasted_iota(jnp.int32, (n, B), 1)
    weight_matrix = jnp.zeros((n, B), dtype=w_ref.dtype)
    for k in range(K):
        weight_matrix = weight_matrix + jnp.where(
            b_iota == idx_ref[:, k][:, None], w_ref[:, k][:, None], 0.0
        )
    contribution = jnp.dot(
        weight_matrix.T, g_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(0) == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += contribution


def _pad_rows(x, multiple):
    n = x.shape[0]
    padded = -(-n // multiple) * multiple
    if padded == n:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((padded - n, *x.shape[1:]), x.dtype)], axis=0
    )


@partial(jax.custom_vjp, nondiff_argnums=())
def weighted_onehot_gather(
    table: jnp.ndarray, indices: jnp.ndarray, weights: jnp.ndarray
) -> jnp.ndarray:
    """MXU gather-reduce: [B, C] table, [N, K] int32 indices, [N, K] weights -> [N, C].

    Requirements: B and C ideally multiples of 128 (pad the table for peak MXU
    utilization); indices in [0, B). Gradients flow to ``table`` and ``weights``.
    """
    return _forward(table, indices, weights)


def _forward(table, indices, weights):
    N, K = indices.shape
    B, C = table.shape
    idx_padded = _pad_rows(indices, _TILE_N)
    w_padded = _pad_rows(weights, _TILE_N)
    num_tiles = idx_padded.shape[0] // _TILE_N

    out = pl.pallas_call(
        _weighted_gather_kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((_TILE_N, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TILE_N, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((idx_padded.shape[0], C), jnp.float32),
    )(idx_padded, w_padded, table)
    return out[:N]


def _scatter_add(indices, weights, g, B):
    """d_table = W^T @ g, accumulated over row tiles."""
    N, K = indices.shape
    C = g.shape[-1]
    idx_padded = _pad_rows(indices, _TILE_N)
    w_padded = _pad_rows(weights, _TILE_N)
    g_padded = _pad_rows(g, _TILE_N)
    num_tiles = idx_padded.shape[0] // _TILE_N

    return pl.pallas_call(
        _scatter_add_kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((_TILE_N, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TILE_N, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((B, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C), jnp.float32),
    )(idx_padded, w_padded, g_padded)


def _fwd(table, indices, weights):
    return _forward(table, indices, weights), (table, indices, weights)


def _bwd(residuals, g):
    table, indices, weights = residuals
    B, C = table.shape
    N, K = indices.shape
    d_table = _scatter_add(indices, weights, g, B).astype(table.dtype)
    # d_weights[n, k] = g[n] . table[indices[n, k]] — reuse the gather kernel with
    # unit weights to fetch the rows, then a row dot
    rows = _forward(
        table,
        indices.reshape(N * K, 1),
        jnp.ones((N * K, 1), dtype=weights.dtype),
    ).reshape(N, K, C)
    d_weights = jnp.einsum("nkc,nc->nk", rows, g).astype(weights.dtype)
    return d_table, None, d_weights


weighted_onehot_gather.defvjp(_fwd, _bwd)


def onehot_gather(table: jnp.ndarray, indices: jnp.ndarray) -> jnp.ndarray:
    """Plain row gather [B, C] x [N] -> [N, C] on the MXU."""
    return weighted_onehot_gather(
        table, indices[:, None], jnp.ones((indices.shape[0], 1), dtype=table.dtype)
    )
