"""Timestep-conditioned UNet, generic over 1/2/3 spatial dims, in flax.linen.

Parity: reference thre3d_elements/thre3infusion/unet.py (UNetModel:390, ResBlock:137,
AttentionBlock:253, Upsample/Downsample:80-134, TimestepEmbedSequential:65). Re-designed
for TPU/XLA:

  * channels-LAST activations ([B, *spatial, C]) so convs/matmuls hit the MXU directly
  * attention as batched einsum over flattened spatial positions (no custom autograd)
  * gradient checkpointing via ``nn.remat`` on ResBlocks (reference nn.py:121-166)
  * optional class conditioning via an embedding added to the time embedding
  * zero-initialized output conv and FiLM scale-shift norm preserved
"""
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from thr3ed_atom_tpu.diffusion.nn import (
    GroupNorm32,
    avg_pool_nd,
    conv_nd,
    timestep_embedding,
)


class ResBlock(nn.Module):
    """Residual block with timestep conditioning (optionally FiLM scale-shift) and
    optional up/down resampling built in (reference unet.py:137-250)."""

    out_channels: int
    dims: int = 2
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, emb, *, deterministic: bool = True):
        in_channels = x.shape[-1]

        h = GroupNorm32()(x)
        h = nn.silu(h)

        if self.up:
            h = _resample(h, self.dims, up=True)
            x = _resample(x, self.dims, up=True)
        elif self.down:
            h = avg_pool_nd(h, self.dims)
            x = avg_pool_nd(x, self.dims)

        h = conv_nd(self.dims, self.out_channels)(h)

        emb_out = nn.silu(emb)
        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels
        )(emb_out)
        # broadcast over spatial dims
        emb_out = emb_out.reshape(
            emb_out.shape[0], *([1] * self.dims), emb_out.shape[-1]
        )

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = GroupNorm32()(h) * (1.0 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out
            h = GroupNorm32()(h)
            h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = conv_nd(self.dims, self.out_channels, zero_init=True)(h)

        if in_channels != self.out_channels:
            x = conv_nd(self.dims, self.out_channels, kernel=1)(x)
        return x + h


def _resample(x, dims: int, up: bool):
    """Nearest-neighbour 2x upsampling over the spatial dims (channels-last)."""
    assert up
    spatial = x.shape[1 : 1 + dims]
    new_spatial = tuple(s * 2 for s in spatial)
    return jax.image.resize(
        x, (x.shape[0], *new_spatial, x.shape[-1]), method="nearest"
    )


class Upsample(nn.Module):
    dims: int = 2
    use_conv: bool = True

    @nn.compact
    def __call__(self, x):
        x = _resample(x, self.dims, up=True)
        if self.use_conv:
            x = conv_nd(self.dims, x.shape[-1])(x)
        return x


class Downsample(nn.Module):
    dims: int = 2
    use_conv: bool = True

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return conv_nd(self.dims, x.shape[-1], stride=2)(x)
        return avg_pool_nd(x, self.dims)


class AttentionBlock(nn.Module):
    """Multi-head self-attention over flattened spatial positions
    (reference unet.py:253-387, QKV einsum attention)."""

    num_heads: int = 1
    num_head_channels: int = -1

    @nn.compact
    def __call__(self, x):
        batch, *spatial, channels = x.shape
        if self.num_head_channels == -1:
            heads = self.num_heads
        else:
            assert channels % self.num_head_channels == 0
            heads = channels // self.num_head_channels
        head_dim = channels // heads

        h = GroupNorm32()(x).reshape(batch, -1, channels)  # [B, N, C]
        qkv = nn.Dense(3 * channels)(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            return t.reshape(batch, -1, heads, head_dim)

        q, k, v = map(split_heads, (q, k, v))
        scale = 1.0 / jnp.sqrt(jnp.sqrt(head_dim)).astype(x.dtype)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k * scale)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(batch, -1, channels)
        out = nn.Dense(
            channels, kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros
        )(out)
        return x + out.reshape(batch, *spatial, channels)


class AttentionPool2d(nn.Module):
    """Attention-based global pooling over 2-D feature maps (reference unet.py:21-50):
    a learned positional embedding + QKV attention where the query is the mean token."""

    embed_dim: int
    output_dim: Optional[int] = None
    num_heads: int = 1

    @nn.compact
    def __call__(self, x):
        batch, h, w, channels = x.shape
        tokens = x.reshape(batch, h * w, channels)
        mean_token = tokens.mean(axis=1, keepdims=True)
        tokens = jnp.concatenate([mean_token, tokens], axis=1)  # [B, 1+N, C]
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(1.0 / channels**0.5),
            (h * w + 1, channels),
        )
        tokens = tokens + pos[None]

        qkv = nn.Dense(3 * self.embed_dim)(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        head_dim = self.embed_dim // self.num_heads

        def split_heads(t):
            return t.reshape(batch, -1, self.num_heads, head_dim)

        q, k, v = map(split_heads, (q, k, v))
        scale = 1.0 / jnp.sqrt(jnp.sqrt(head_dim)).astype(x.dtype)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k * scale)
        weights = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(x.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v).reshape(
            batch, -1, self.embed_dim
        )
        out = nn.Dense(self.output_dim or self.embed_dim)(out)
        return out[:, 0]  # the pooled (mean-query) token


def count_flops_attn(batch: int, spatial, channels: int) -> int:
    """FLOPs of a QKV attention block over flattened ``spatial`` positions
    (counterpart of the reference's thop hook, unet.py:302-319)."""
    num_spatial = int(np.prod(spatial))
    # two einsums: [B, N, C] @ [B, C, N] and [B, N, N] @ [B, N, C]
    return 2 * batch * (num_spatial**2) * channels


class UNetModel(nn.Module):
    """The full UNet (reference unet.py:390-643).

    Args mirror the reference's constructor; ``attention_resolutions`` lists the
    downsample factors at which attention blocks are inserted.
    """

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Sequence[int] = ()
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    dims: int = 2
    num_classes: Optional[int] = None
    use_checkpoint: bool = False
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    use_bottleneck_attn: bool = True
    conv_resample: bool = True
    resblock_updown: bool = False
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, timesteps, y=None, *, deterministic: bool = True):
        assert (y is not None) == (self.num_classes is not None), (
            "must specify y iff the model is class-conditional"
        )

        block = nn.remat(ResBlock, static_argnums=()) if self.use_checkpoint else ResBlock

        # timestep (+ class) embedding MLP: model_channels -> 4x
        time_embed_dim = self.model_channels * 4
        emb = timestep_embedding(timesteps, self.model_channels)
        emb = nn.Dense(time_embed_dim)(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(time_embed_dim)(emb)
        if self.num_classes is not None:
            emb = emb + nn.Embed(self.num_classes, time_embed_dim)(y)

        def maybe_attn(h, ds):
            if ds in self.attention_resolutions:
                h = AttentionBlock(
                    num_heads=self.num_heads, num_head_channels=self.num_head_channels
                )(h)
            return h

        # down path
        h = conv_nd(self.dims, self.model_channels)(x)
        skips = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = block(
                    out_channels=mult * self.model_channels,
                    dims=self.dims,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dropout=self.dropout,
                )(h, emb, deterministic=deterministic)
                h = maybe_attn(h, ds)
                skips.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = block(
                        out_channels=h.shape[-1],
                        dims=self.dims,
                        use_scale_shift_norm=self.use_scale_shift_norm,
                        down=True,
                        dropout=self.dropout,
                    )(h, emb, deterministic=deterministic)
                else:
                    h = Downsample(dims=self.dims, use_conv=self.conv_resample)(h)
                skips.append(h)
                ds *= 2

        # bottleneck: Res (+Attn) Res
        mid_channels = h.shape[-1]
        h = block(
            out_channels=mid_channels,
            dims=self.dims,
            use_scale_shift_norm=self.use_scale_shift_norm,
            dropout=self.dropout,
        )(h, emb, deterministic=deterministic)
        if self.use_bottleneck_attn:
            h = AttentionBlock(
                num_heads=self.num_heads, num_head_channels=self.num_head_channels
            )(h)
        h = block(
            out_channels=mid_channels,
            dims=self.dims,
            use_scale_shift_norm=self.use_scale_shift_norm,
            dropout=self.dropout,
        )(h, emb, deterministic=deterministic)

        # up path with skip concatenation
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = block(
                    out_channels=mult * self.model_channels,
                    dims=self.dims,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    dropout=self.dropout,
                )(h, emb, deterministic=deterministic)
                h = maybe_attn(h, ds)
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = block(
                            out_channels=h.shape[-1],
                            dims=self.dims,
                            use_scale_shift_norm=self.use_scale_shift_norm,
                            up=True,
                            dropout=self.dropout,
                        )(h, emb, deterministic=deterministic)
                    else:
                        h = Upsample(dims=self.dims, use_conv=self.conv_resample)(h)
                    ds //= 2

        # zero-initialized output projection
        h = GroupNorm32()(h)
        h = nn.silu(h)
        return conv_nd(self.dims, self.out_channels, zero_init=True)(h)
