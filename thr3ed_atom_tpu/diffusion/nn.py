"""Diffusion NN building blocks, JAX/flax edition.

Parity: reference thre3d_elements/thre3infusion/nn.py (SiLU :92, GroupNorm32 :95-98,
conv_nd :22-37, avg_pool_nd :40-52, update_ema :55-64, zero_module/scale_module :67-82,
mean_flat :85-89, timestep_embedding :101-118, CheckpointFunction :121-166).

TPU-native replacements: channels-LAST layout everywhere (JAX/XLA convention; the MXU
wants the channel contraction minor), fp32 GroupNorm with 16 groups as a dtype-pinned
flax module, gradient checkpointing via ``flax.linen.remat`` / ``jax.checkpoint`` instead
of a hand-written autograd.Function, and EMA as a pure pytree polyak update.
"""
import math

import flax.linen as nn
import jax
import jax.numpy as jnp


class GroupNorm32(nn.Module):
    """GroupNorm with 16 groups computed in float32 regardless of activation dtype."""

    num_groups: int = 16

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        # largest group count <= num_groups that divides the channel width (skip
        # concatenations can produce widths not divisible by 16)
        channels = x.shape[-1]
        groups = min(self.num_groups, channels)
        while channels % groups:
            groups -= 1
        out = nn.GroupNorm(num_groups=groups, dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        return out.astype(orig_dtype)


def conv_nd(dims: int, features: int, kernel: int = 3, stride: int = 1, zero_init: bool = False):
    """1/2/3-D convolution factory (channels-last)."""
    kwargs = {}
    if zero_init:
        kwargs = dict(
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros
        )
    return nn.Conv(
        features=features,
        kernel_size=(kernel,) * dims,
        strides=(stride,) * dims,
        padding="SAME",
        **kwargs,
    )


def avg_pool_nd(x, dims: int, window: int = 2):
    """1/2/3-D average pooling with stride == window (channels-last)."""
    return nn.avg_pool(x, window_shape=(window,) * dims, strides=(window,) * dims)


def mean_flat(tensor: jnp.ndarray) -> jnp.ndarray:
    """Mean over all non-batch dimensions."""
    return tensor.reshape(tensor.shape[0], -1).mean(axis=-1)


def update_ema(ema_params, new_params, rate: float = 0.99):
    """Polyak averaging over parameter pytrees: ema <- ema * rate + new * (1 - rate)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * rate + p * (1.0 - rate), ema_params, new_params
    )


def scale_module_params(params, scale: float):
    """Scale all parameters of a module pytree (counterpart of scale_module)."""
    return jax.tree_util.tree_map(lambda p: p * scale, params)


def timestep_embedding(
    timesteps: jnp.ndarray, dim: int, max_period: int = 10000
) -> jnp.ndarray:
    """Sinusoidal timestep embeddings: [N] -> [N, dim]."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding
