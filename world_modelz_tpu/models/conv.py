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

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
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


# ---------------------------------------------------------------------------
# Polyphase-fused bilinear-2x-upsample + conv3x3
# ---------------------------------------------------------------------------
#
# The decoder's hot sequence `conv3x3(upsample_2x(h))` (autoencoder.py:138
# -> :99) materializes the 4x-size upsampled tensor in HBM (a gather) and
# then convolves it. The composition collapses EXACTLY into one low-res
# conv: each high-res output phase (p, q) in {0,1}^2 is a 3x3 conv over the
# LOW-res input whose kernel is a fixed bilinear mixture of the original
# 3x3 kernel. One conv producing 4*C_out channels + a depth-to-space gives
# the same FLOP count as the high-res conv but reads 1/4 the pixels and
# never touches the upsampled intermediate.
#
# Exactness at the borders: torch-style align_corners=False bilinear CLAMPS
# out-of-range taps to the edge; clamping a tap is algebraically identical
# to reading an edge-REPLICATED pad, so the main conv runs VALID over an
# edge-padded input. The subsequent conv3x3 however ZERO-pads at high-res:
# its out-of-image taps (high-res row/col -1 and 2H/2W) must contribute
# nothing, while the padded polyphase conv makes them contribute the
# clamped upsample values. Those fake contributions only reach the
# outermost high-res output ring, so a 1-px border correction subtracts
# them: a 1-D conv of the fake boundary row/col with the kernel's
# corresponding row/col, with the four corner cells added back once (they
# are subtracted by both the row and the column pass).

# _PHASE[p, u, d]: weight of high-res kernel element d (-1,0,+1) on low-res
# tap u (m-1, m, m+1) for output phase p — derived from the half-pixel
# bilinear weights (3/4, 1/4)
_PHASE = np.array(
    [
        [[0.75, 0.25, 0.0], [0.25, 0.75, 0.75], [0.0, 0.0, 0.25]],
        [[0.25, 0.0, 0.0], [0.75, 0.75, 0.25], [0.0, 0.25, 0.75]],
    ]
)


def _upsample1d(v: jnp.ndarray) -> jnp.ndarray:
    """(B, N, C) -> (B, 2N, C) bilinear half-pixel upsample with clamped
    ends (matches jax.image.resize / torch align_corners=False in 1-D)."""
    vp = jnp.concatenate([v[:, :1], v, v[:, -1:]], axis=1)
    even = 0.25 * vp[:, :-2] + 0.75 * vp[:, 1:-1]
    odd = 0.75 * vp[:, 1:-1] + 0.25 * vp[:, 2:]
    b, n, c = v.shape
    return jnp.stack([even, odd], axis=2).reshape(b, 2 * n, c)


def _edge_conv1d(line_ext: jnp.ndarray, k3: jnp.ndarray) -> jnp.ndarray:
    """VALID 3-tap conv of an extended boundary line.

    line_ext: (B, 2N + 2, C_in) — the fake high-res boundary with its two
    fake corner cells; k3: (3, C_in, C_out) — one kernel row/col."""
    taps = jnp.stack(
        [line_ext[:, :-2], line_ext[:, 1:-1], line_ext[:, 2:]], axis=0
    )
    return jnp.einsum("sbnc,sco->bno", taps, k3.astype(line_ext.dtype))


def fused_upsample_conv3x3(
    x: jnp.ndarray, kernel: jnp.ndarray, bias=None
) -> jnp.ndarray:
    """conv3x3(padding=1)(upsample_2x(x)) in one low-res pass.

    x: (B, H, W, C_in); kernel: (3, 3, C_in, C_out) HWIO; returns
    (B, 2H, 2W, C_out). Equality with the unfused composition (up to
    reassociation rounding) is golden-tested including all borders.
    """
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    dt = jnp.promote_types(x.dtype, kernel.dtype)
    x = x.astype(dt)
    k = kernel.astype(jnp.float32)

    a = jnp.asarray(_PHASE, jnp.float32)
    # Wf[p,q,u,v,i,o] = sum_{d,e} PHASE[p,u,d] PHASE[q,v,e] K[d,e,i,o]
    wf = jnp.einsum("pud,qve,deio->pquvio", a, a, k)
    wc = (
        wf.transpose(2, 3, 4, 0, 1, 5)
        .reshape(3, 3, cin, 4 * cout)
        .astype(dt)
    )

    xe = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = jax.lax.conv_general_dilated(
        xe, wc, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (B, H, W, 4*C_out), phases packed (p, q, o)
    y = (
        y.reshape(b, h, w, 2, 2, cout)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, 2 * h, 2 * w, cout)
    )

    # 1-px border correction (see block comment above). Fake boundary
    # lines are the clamped upsample values the zero-padding conv must
    # NOT see; their corner extensions are the doubly-clamped corners.
    k = k.astype(dt)
    top = _upsample1d(x[:, 0])  # (B, 2W, C_in)
    bot = _upsample1d(x[:, -1])
    left = _upsample1d(x[:, :, 0])  # (B, 2H, C_in)
    right = _upsample1d(x[:, :, -1])

    def ext(line, lo, hi):
        return jnp.concatenate([lo[:, None], line, hi[:, None]], axis=1)

    c00, c01 = x[:, 0, 0], x[:, 0, -1]
    c10, c11 = x[:, -1, 0], x[:, -1, -1]
    y = y.at[:, 0].add(-_edge_conv1d(ext(top, c00, c01), k[0]))
    y = y.at[:, -1].add(-_edge_conv1d(ext(bot, c10, c11), k[2]))
    y = y.at[:, :, 0].add(-_edge_conv1d(ext(left, c00, c10), k[:, 0]))
    y = y.at[:, :, -1].add(-_edge_conv1d(ext(right, c01, c11), k[:, 2]))
    # corners were subtracted by both the row and the column pass
    y = y.at[:, 0, 0].add(jnp.einsum("bi,io->bo", c00, k[0, 0]))
    y = y.at[:, 0, -1].add(jnp.einsum("bi,io->bo", c01, k[0, 2]))
    y = y.at[:, -1, 0].add(jnp.einsum("bi,io->bo", c10, k[2, 0]))
    y = y.at[:, -1, -1].add(jnp.einsum("bi,io->bo", c11, k[2, 2]))

    if bias is not None:
        y = y + bias.astype(dt)
    return y


class _ConvParams(nn.Module):
    """Declares exactly nn.Conv's parameter tree ({kernel, bias}, same
    shapes and initializers) but returns the raw arrays — so the fused
    upsample+conv path can consume the weights while checkpoints stay
    interchangeable with the nn.Conv layout."""

    features: int
    kernel_size: Tuple[int, int]
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, in_features, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


class UpscaleResidual(nn.Module):
    """Pre-activation residual upsample block (autoencoder.py:89-131)."""

    out_planes: int
    upsample: bool = True
    # polyphase-fused upsample+conv (exact; golden-tested). MEASURED SLOWER
    # on v5e than the literal composition it replaces (decode 7.4->9.2 ms
    # at batch 256: the (h,w,2,2,c)->(2h,2w,c) depth-to-space interleave
    # plus 1-px border-correction passes cost more HBM traffic than the 4x
    # upsampled intermediate they avoid — probe: fused 0.93 ms vs literal
    # 0.62 ms at 256x16x16x128). Kept as an opt-in negative result; default
    # = the literal upsample-then-conv (XLA resize + conv, ~60% MFU).
    fuse_upsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool) -> jnp.ndarray:
        in_planes = x.shape[-1]
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        h = leaky_relu(h)
        if self.upsample and self.fuse_upsample:
            # explicit name keeps the param path of the nn.Conv this
            # replaces (auto-numbering would have assigned Conv_0)
            wc, bc = _ConvParams(self.out_planes, (3, 3), name="Conv_0")(
                h.shape[-1]
            )
            h = fused_upsample_conv3x3(h, wc, bc)
        else:
            if self.upsample:
                h = upsample_2x(h)
            h = nn.Conv(
                self.out_planes, (3, 3), padding=1, use_bias=True,
                name="Conv_0",
            )(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
        h = leaky_relu(h)
        h = nn.Conv(
            self.out_planes, (3, 3), padding=1, use_bias=True, name="Conv_1"
        )(h)
        if in_planes != self.out_planes or self.upsample:
            # The reference projects the skip AFTER interpolating
            # (autoencoder.py:119-121,138); a 1x1 conv (pointwise channel
            # mix) commutes with per-channel bilinear interpolation, and
            # interpolating a constant bias is the identity — so project at
            # LOW resolution first: 1/4 the projection FLOPs, same params,
            # equal up to float rounding (commute test in test_tokenizer.py).
            x = nn.Conv(
                self.out_planes, (1, 1), use_bias=True, name="Conv_2"
            )(x)
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
