"""Trilinear interpolation into a dense voxel grid, matching PyTorch grid_sample semantics.

The reference feeds a [W, D, H, C] voxel grid into ``torch.grid_sample`` with the
``permute(0, 4, 3, 2, 1)`` z,y,x convention and ``align_corners=False`` (reference
thre3d_atom/thre3d_reprs/voxels.py:295-321). Net effect of that permute dance: a
normalized query point (x, y, z) in [-1, 1]^3 indexes the (width_x, depth_y, height_z)
axes of the grid directly. This module implements exactly those semantics as a pure JAX
gather, which is both the correctness oracle for the Pallas kernel and the always-available
fallback path.

align_corners=False convention: normalized coordinate c in [-1, 1] maps to the continuous
voxel-index coordinate ((c + 1) * size - 1) / 2, i.e. -1 and +1 land half a voxel outside
the first/last voxel centers. padding_mode='zeros': out-of-range corner taps contribute 0.
"""
from functools import partial

import jax
import jax.numpy as jnp


def _unnormalize(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """[-1, 1] -> continuous voxel index, align_corners=False."""
    return ((coords + 1.0) * size - 1.0) * 0.5


@partial(jax.jit, static_argnames=())
def trilinear_grid_sample(volume: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample ``volume`` at normalized coordinates with trilinear interpolation.

    Args:
        volume: [W, D, H, C] grid of vertex values.
        coords: [N, 3] normalized (x, y, z) in [-1, 1]; x indexes W, y indexes D, z indexes H.

    Returns:
        [N, C] interpolated values; taps outside the grid contribute zero
        (padding_mode='zeros' parity).
    """
    W, D, H, C = volume.shape

    ix = _unnormalize(coords[:, 0], W)
    iy = _unnormalize(coords[:, 1], D)
    iz = _unnormalize(coords[:, 2], H)

    ix0 = jnp.floor(ix)
    iy0 = jnp.floor(iy)
    iz0 = jnp.floor(iz)
    fx = ix - ix0
    fy = iy - iy0
    fz = iz - iz0

    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)
    iz0 = iz0.astype(jnp.int32)

    flat = volume.reshape(-1, C)

    def tap(dx, dy, dz):
        x = ix0 + dx
        y = iy0 + dy
        z = iz0 + dz
        valid = (
            (x >= 0) & (x < W) & (y >= 0) & (y < D) & (z >= 0) & (z < H)
        )
        xc = jnp.clip(x, 0, W - 1)
        yc = jnp.clip(y, 0, D - 1)
        zc = jnp.clip(z, 0, H - 1)
        idx = (xc * D + yc) * H + zc
        vals = jnp.take(flat, idx, axis=0)
        wx = fx if dx == 1 else (1.0 - fx)
        wy = fy if dy == 1 else (1.0 - fy)
        wz = fz if dz == 1 else (1.0 - fz)
        w = (wx * wy * wz) * valid.astype(vals.dtype)
        return vals * w[:, None]

    out = tap(0, 0, 0)
    for dx, dy, dz in [(0, 0, 1), (0, 1, 0), (0, 1, 1), (1, 0, 0), (1, 0, 1), (1, 1, 0), (1, 1, 1)]:
        out = out + tap(dx, dy, dz)
    return out
