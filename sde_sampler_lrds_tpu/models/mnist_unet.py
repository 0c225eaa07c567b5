"""14×14-MNIST UNet control network (Flax, NHWC).

Re-design of sde_sampler/models/mnist_unet.py:16-315 in the TPU-native NHWC
layout: two resolutions (14→7), residual blocks with time conditioning,
single-head attention at the 7×7 level, transposed-conv upsampling, optional
near-zero init of the output projection. Input/output are flat (B, 196)
vectors like every other control net.

Note: the reference's AttentionBlock defines a GroupNorm that its forward
never applies (mnist_unet.py:36 vs :47-81); we match the executed behavior.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from .mlp import TimeEmbed, zero_init_bias, zero_init_kernel


class AttentionBlock(nn.Module):
    n_channels: int
    n_heads: int = 1
    d_k: int | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        d_k = self.d_k or self.n_channels
        b, h, w, c = x.shape
        seq = x.reshape(b, h * w, c)
        qkv = nn.Dense(self.n_heads * d_k * 3)(seq).reshape(b, -1, self.n_heads, 3 * d_k)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        attn = jnp.einsum("bihd,bjhd->bijh", q, k) * d_k**-0.5
        attn = nn.softmax(attn, axis=2)
        res = jnp.einsum("bijh,bjhd->bihd", attn, v).reshape(b, -1, self.n_heads * d_k)
        res = nn.Dense(self.n_channels)(res) + seq
        return res.reshape(b, h, w, c)


class ResidualBlock(nn.Module):
    out_channels: int
    n_groups: int = 16
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, t_emb, deterministic: bool = True):
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME")(
            nn.silu(nn.GroupNorm(num_groups=min(self.n_groups, x.shape[-1]))(x)))
        h = h + nn.Dense(self.out_channels)(nn.silu(t_emb))[:, None, None, :]
        h = nn.silu(nn.GroupNorm(num_groups=min(self.n_groups, self.out_channels))(h))
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3, 3), padding="SAME")(h)
        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1))(x)
        return h + x


class DownBlock(nn.Module):
    out_channels: int
    has_attn: bool = False

    @nn.compact
    def __call__(self, x, t_emb, deterministic: bool = True):
        x = ResidualBlock(self.out_channels)(x, t_emb, deterministic)
        if self.has_attn:
            x = AttentionBlock(self.out_channels)(x)
        return x


class UpBlock(nn.Module):
    out_channels: int
    has_attn: bool = False

    @nn.compact
    def __call__(self, x, t_emb, deterministic: bool = True):
        x = ResidualBlock(self.out_channels)(x, t_emb, deterministic)
        if self.has_attn:
            x = AttentionBlock(self.out_channels)(x)
        return x


class MiddleBlock(nn.Module):
    n_channels: int

    @nn.compact
    def __call__(self, x, t_emb, deterministic: bool = True):
        x = ResidualBlock(self.n_channels)(x, t_emb, deterministic)
        x = AttentionBlock(self.n_channels)(x)
        return ResidualBlock(self.n_channels)(x, t_emb, deterministic)


class Unet(nn.Module):
    """The 14×14 UNet (mnist_unet.py:238): (t (B,), x (B, 196)) -> (B, 196)."""

    n_channels: int = 32
    image_channels: int = 1
    rev_proj_channels: Sequence[int] | None = None
    init_last_layer_with_zeros: bool = False
    side: int = 14

    @nn.compact
    def __call__(self, t, x, deterministic: bool = True):
        orig_shape = x.shape
        nc = self.n_channels
        img = x.reshape(-1, self.side, self.side, self.image_channels)
        t_emb = TimeEmbed(dim_out=4 * nc, channels=nc, num_layers=2,
                          activation=nn.silu)(t)
        h = nn.Conv(nc, (3, 3), padding="SAME")(img)
        h = DownBlock(nc)(h, t_emb, deterministic)
        skip1 = h
        h = nn.Conv(nc, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))(h)  # 14 -> 7
        h = DownBlock(2 * nc, has_attn=True)(h, t_emb, deterministic)
        skip2 = h
        h = MiddleBlock(2 * nc)(h, t_emb, deterministic)
        h = UpBlock(2 * nc, has_attn=True)(
            jnp.concatenate([h, skip2], axis=-1), t_emb, deterministic)
        # SAME padding => out = in*stride exactly (flax ConvTranspose pads the
        # stride-dilated input, so explicit (1,1) would give 2·in−2, not 2·in)
        h = nn.ConvTranspose(2 * nc, (4, 4), strides=(2, 2),
                             padding="SAME")(h)  # 7 -> 14
        h = UpBlock(nc)(jnp.concatenate([h, skip1], axis=-1), t_emb, deterministic)
        # output projection (optionally deeper, optionally near-zero init)
        channels = ([nc] + list(self.rev_proj_channels) + [self.image_channels]) \
            if self.rev_proj_channels is not None else [nc, self.image_channels]
        for i in range(len(channels) - 1):
            h = nn.silu(nn.GroupNorm(num_groups=min(16, channels[i]))(h))
            kwargs = {}
            if self.init_last_layer_with_zeros and i == len(channels) - 2:
                kwargs = {"kernel_init": zero_init_kernel(),
                          "bias_init": zero_init_bias(fan_in=9 * channels[i])}
            h = nn.Conv(channels[i + 1], (3, 3), padding="SAME", **kwargs)(h)
        return h.reshape(orig_shape)
