"""UNet denoiser for continuous DDPM.

Parity with `UNetDiffusionModel` (som-diffusion/diffusion_model_unet.py:
210-339, itself an improved-diffusion derivative): sinusoidal timestep
embedding with the reference's `stretch` factor (:320-324), ResBlocks with
scale-shift GroupNorm conditioning (:103-157), spatial self-attention at
configurable downsample levels (:160-207), symmetric down/middle/up path with
skip concatenation, and zero-initialized output convolutions (:26-32).

Layout is NHWC (TPU-native); continuous t in [0, 1] enters as (B, 1).
Also includes `SimpleDiffusionModel` (som-diffusion/diffusion_model.py:10-99),
the conv-resnet predecessor kept for capability parity.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def timestep_embedding(
    t: jnp.ndarray, dim: int, stretch: float = 5000.0, max_period: float = 1e4
) -> jnp.ndarray:
    """(B, 1) continuous t -> (B, dim) sin/cos features
    (diffusion_model_unet.py:320-324)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    ) * stretch
    args = t.reshape(-1, 1) * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


def zeros_conv(features: int, kernel: Tuple[int, int] = (3, 3)) -> nn.Conv:
    """Conv with zero-initialized weights (zero_module, :26-32)."""
    return nn.Conv(
        features,
        kernel,
        padding=kernel[0] // 2,
        kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros,
    )


class ResBlock(nn.Module):
    """GroupNorm -> SiLU -> conv with scale-shift timestep conditioning
    (diffusion_model_unet.py:103-157)."""

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = True

    @nn.compact
    def __call__(self, x, emb, *, train: bool = False):
        in_ch = x.shape[-1]
        h = nn.GroupNorm(num_groups=32)(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1)(h)

        emb_out = nn.Dense(
            2 * self.out_channels
            if self.use_scale_shift_norm
            else self.out_channels
        )(nn.silu(emb))
        emb_out = emb_out[:, None, None, :]

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = nn.GroupNorm(num_groups=32)(h) * (1 + scale) + shift
        else:
            h = h + emb_out
            h = nn.GroupNorm(num_groups=32)(h)
        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = zeros_conv(self.out_channels)(h)

        if in_ch != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1))(x)
        return x + h


class AttentionBlock(nn.Module):
    """Spatial self-attention (diffusion_model_unet.py:160-207)."""

    num_heads: int = 1

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        ch = c // self.num_heads
        normed = nn.GroupNorm(num_groups=32)(x).reshape(b, h * w, c)
        qkv = nn.Conv(3 * c, (1,), name="qkv")(normed)  # (B, HW, 3C)
        qkv = qkv.reshape(b, h * w, self.num_heads, 3 * ch)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        # split-scale softmax (more f16-stable; :202-206)
        scale = 1.0 / math.sqrt(math.sqrt(ch))
        attn = jnp.einsum(
            "bnhc,bmhc->bhnm", q * scale, k * scale,
            preferred_element_type=jnp.float32,
        )
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhnm,bmhc->bnhc", attn, v).reshape(b, h * w, c)
        out = nn.Conv(
            c, (1,), kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros, name="proj_out",
        )(out)
        return x + out.reshape(b, h, w, c)


class UNetDiffusionModel(nn.Module):
    """(x (B,H,W,C), t (B,1)) -> eps prediction (B,H,W,C)."""

    in_channels: int = 2
    out_channels: int = 2
    model_channels: int = 128
    num_res_blocks: int = 3
    channel_mult: Sequence[int] = (1, 2, 3, 4)
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    attention_resolutions: Sequence[int] = (2, 4)
    num_heads: int = 4
    num_heads_upsample: int = 4

    @nn.compact
    def __call__(self, x, t, *, train: bool = False):
        time_dim = self.model_channels * 4
        emb = timestep_embedding(t, self.model_channels)
        emb = nn.Dense(time_dim)(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(time_dim)(emb)

        h = nn.Conv(self.model_channels, (3, 3), padding=1)(x)
        hs = [h]
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                h = ResBlock(
                    mult * self.model_channels,
                    dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                )(h, emb, train=train)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(num_heads=self.num_heads)(h)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = nn.Conv(
                    h.shape[-1], (3, 3), strides=(2, 2), padding=1
                )(h)
                hs.append(h)
                ds *= 2

        h = ResBlock(
            h.shape[-1], dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
        )(h, emb, train=train)
        h = AttentionBlock(num_heads=self.num_heads)(h)
        h = ResBlock(
            h.shape[-1], dropout=self.dropout,
            use_scale_shift_norm=self.use_scale_shift_norm,
        )(h, emb, train=train)

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResBlock(
                    self.model_channels * mult,
                    dropout=self.dropout,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                )(h, emb, train=train)
                if ds in self.attention_resolutions:
                    h = AttentionBlock(num_heads=self.num_heads_upsample)(h)
                if level and i == self.num_res_blocks:
                    b, hh, ww, c = h.shape
                    h = jax.image.resize(
                        h, (b, hh * 2, ww * 2, c), method="nearest"
                    )
                    h = nn.Conv(c, (3, 3), padding=1)(h)
                    ds //= 2

        h = nn.GroupNorm(num_groups=32)(h)
        h = nn.silu(h)
        return zeros_conv(self.out_channels)(h)


class SimpleDiffusionModel(nn.Module):
    """Conv-resnet denoiser with sinusoidal t concatenated per pixel
    (som-diffusion/diffusion_model.py:10-99); superseded by the UNet but kept
    for parity."""

    d_model: int = 256
    num_layers: int = 8
    d_pos: int = 32
    dropout: float = 0.0
    out_channels: int = 2

    @nn.compact
    def __call__(self, x, t, *, train: bool = False):
        b, h, w, c = x.shape
        pe = timestep_embedding(t, self.d_pos, stretch=1.0)  # (B, d_pos)
        pe = jnp.broadcast_to(pe[:, None, None, :], (b, h, w, self.d_pos))
        y = jnp.concatenate([x, pe], axis=-1)
        y = nn.Conv(self.d_model, (3, 3), padding=1)(y)
        for _ in range(self.num_layers):
            residual = y
            z = nn.GroupNorm(num_groups=32)(y)
            z = nn.silu(z)
            z = nn.Conv(self.d_model, (3, 3), padding=1)(z)
            z = nn.GroupNorm(num_groups=32)(z)
            z = nn.silu(z)
            z = nn.Dropout(self.dropout, deterministic=not train)(z)
            z = nn.Conv(self.d_model, (3, 3), padding=1)(z)
            y = residual + z
        y = nn.GroupNorm(num_groups=32)(y)
        y = nn.silu(y)
        return zeros_conv(self.out_channels)(y)
