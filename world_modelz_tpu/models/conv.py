"""Residual conv encoder/decoder stacks for the frame tokenizer.

Capability parity with the reference autoencoder blocks
(vq-video-diffusion/autoencoder.py:8-152 ≡ minecraft/autoencoder.py):
strided residual downscale blocks, bilinear-upsample residual decoder,
BatchNorm + LeakyReLU. Re-designed for TPU:

- NHWC layout throughout (XLA's native TPU conv layout; the reference is NCHW).
- flax.linen modules with explicit `train` flags; BatchNorm batch statistics
  are computed in global view, so under pjit data parallelism they are
  automatically synchronized across devices (the reference is single-device).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def leaky_relu(x: jnp.ndarray) -> jnp.ndarray:
    # torch nn.LeakyReLU default negative_slope (autoencoder.py:19)
    return jax.nn.leaky_relu(x, negative_slope=0.01)


class Residual(nn.Module):
    """Strided residual block (autoencoder.py:18-42).

    conv3x3(stride) -> BN -> LeakyReLU -> conv1x1 -> BN, added to a (strided,
    BN'd) shortcut, then LeakyReLU. Channel count is preserved.
    """

    hidden_planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        in_planes = x.shape[-1]
        h = nn.Conv(
            self.hidden_planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=1,
            use_bias=False,
        )(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = leaky_relu(h)
        h = nn.Conv(in_planes, (1, 1), use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)

        residual = x
        if self.stride != 1:
            residual = nn.Conv(
                in_planes,
                (self.stride, self.stride),
                strides=(self.stride, self.stride),
                use_bias=False,
            )(x)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9)(
                residual
            )
        return leaky_relu(h + residual)


class ResidualStack(nn.Module):
    """num_layers x [stride-1 block, stride-2 block] -> 2x downscale per layer
    (autoencoder.py:45-57)."""

    num_layers: int
    hidden_planes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        for _ in range(self.num_layers):
            x = Residual(self.hidden_planes, stride=1)(x, train=train)
            x = Residual(self.hidden_planes, stride=2)(x, train=train)
        return x


class SimpleResidualEncoder(nn.Module):
    """conv3x3 stem + residual downscale stack (autoencoder.py:60-86).

    Maps (B, H, W, C_in) -> (B, H/2^L, W/2^L, out_planes).
    """

    out_planes: int
    num_layers: int
    hidden_planes: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        x = nn.Conv(self.out_planes, (3, 3), padding=1, use_bias=False)(x)
        x = leaky_relu(x)
        return ResidualStack(self.num_layers, self.hidden_planes)(x, train=train)


def upsample_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Bilinear 2x upsample, half-pixel centers.

    Matches torch F.interpolate(scale_factor=2, mode='bilinear',
    align_corners=False) (autoencoder.py:138). Note: a hand-rolled separable
    2-tap stencil (pad/slice/interleave) was measured 40% SLOWER end-to-end
    on TPU than XLA's resize — the interleaving reshape forces layout
    changes; XLA's gather-based lowering wins. Keep the library op.
    """
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="bilinear")


class UpscaleResidual(nn.Module):
    """Pre-activation residual upsample block (autoencoder.py:89-131)."""

    out_planes: int
    upsample: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        in_planes = x.shape[-1]
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        h = leaky_relu(h)
        if self.upsample:
            h = upsample_2x(h)
        h = nn.Conv(self.out_planes, (3, 3), padding=1, use_bias=True)(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = leaky_relu(h)
        h = nn.Conv(self.out_planes, (3, 3), padding=1, use_bias=True)(h)
        if in_planes != self.out_planes or self.upsample:
            # The reference projects the skip AFTER interpolating
            # (autoencoder.py:119-121,138); a 1x1 conv (pointwise channel
            # mix) commutes with per-channel bilinear interpolation, and
            # interpolating a constant bias is the identity — so project at
            # LOW resolution first: 1/4 the projection FLOPs, same params,
            # equal up to float rounding (commute test in test_models.py).
            x = nn.Conv(self.out_planes, (1, 1), use_bias=True)(x)
        if self.upsample:
            x = upsample_2x(x)
        return h + x


class SimpleResidualDecoder(nn.Module):
    """conv stem + upscale residual chain + output conv
    (autoencoder.py:134-152). `cfg` lists the hidden channel count of each 2x
    upscale stage."""

    cfg: Sequence[int]
    out_channels: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        in_channels = x.shape[-1]
        x = nn.Conv(in_channels, (3, 3), padding=1, use_bias=False)(x)
        for hidden in self.cfg:
            x = UpscaleResidual(hidden, upsample=True)(x, train=train)
        return nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False)(x)
