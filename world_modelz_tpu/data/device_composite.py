"""On-device MovingMNIST compositing — ship trajectories, not pixels.

The host generator (data/moving_mnist.py, parity with
vq-video-diffusion/data/moving_mnist.py:38-95) composites digit sprites
into (S, H, W, 1) pixel clips on the CPU and ships them to the device.
At the production configuration (batch 64, 10-step fused dispatch) that
is ~16-28 MB of uint8 frames per dispatch over the TPU relay; the
underlying information is two 24x24 sprites and a handful of (y, x)
positions per clip — ~1 KB. This module moves the O(S*H*W) compositing
into the jitted train step so only the trajectories cross host->device.

Semantics match the native host compositor exactly
(data/_native/compositor.cpp `composite_sprite` + `clamp01`): sprites are
ADDED into a zero canvas at per-frame top-left (y, x) offsets, then the
frame is clamped to [0, 1]. Off-canvas sprite regions are clipped (the
bounce dynamics never produce them, but the placement operators zero
them anyway).

TPU-first formulation: placement is two tiny matmuls per (clip, digit,
frame) — `canvas = Sy @ sprite @ Sx^T` with one-hot shift operators
`Sy[r, i] = [r == y + i]` — so the whole compositor rides the MXU
(~26 us at the b64 production shape vs ~716 us for the earlier
`take_along_axis` gather formulation, which serialized on the VPU).
Exactness: every output pixel receives exactly ONE sprite element per
digit (one-hot rows have a single 1), and the matmuls run on the RAW
uint8 sprite values (integers 0..255, exact in bfloat16) with float32
accumulation, dividing by 255 afterward — matching the host compositor's
float32 path to 1 ulp (XLA may fuse the divide into the digit sum)
despite the MXU's bf16 operands. Measured on TPU: maxdiff 1.19e-07 vs
the host path at the b64 production shape, incl. off-canvas clipping.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _placement(idx, size: int, k: int, dtype):
    """One-hot shift operator (..., size, k): out[r, i] = [r == idx + i].

    Rows with idx + i outside [0, size) have no hit — off-canvas sprite
    regions are clipped for free.
    """
    rows = jnp.arange(size, dtype=idx.dtype)
    cols = jnp.arange(k, dtype=idx.dtype)
    return (
        rows[None, None, None, :, None] == idx[..., None, None] + cols
    ).astype(dtype)


def composite_clips(sprites, pos, image_size: int):
    """Render bouncing-sprite clips on device.

    Args:
      sprites: (B, D, K, K) uint8 (1/255-quantized) or float digit sprites.
      pos: (B, D, S, 2) int32 per-frame top-left (y, x) sprite positions.
      image_size: output canvas side H = W.

    Returns:
      (B, S, H, W, 1) float32 frames in [0, 1]: per-frame additive
      composite of the D sprites, saturated at 1.
    """
    h = w = image_size
    y = pos[..., 0]  # (B, D, S)
    x = pos[..., 1]
    if sprites.dtype == jnp.uint8:
        # integer-exact MXU path: bf16 holds 0..255 exactly, one-hots are
        # exactly 0/1, and each output is a single product — f32 results
        # are exact integers; divide by 255 in f32 afterward (matches the
        # host compositor's per-element float32 division)
        spr = sprites.astype(jnp.bfloat16)
        oy = _placement(y, h, spr.shape[-1], jnp.bfloat16)
        ox = _placement(x, w, spr.shape[-1], jnp.bfloat16)
        kw = dict(preferred_element_type=jnp.float32)
        rows = jnp.einsum("bdshk,bdkj->bdshj", oy, spr, **kw)
        img = jnp.einsum(
            "bdshj,bdswj->bdshw", rows.astype(jnp.bfloat16), ox, **kw
        )
        # rows are exact integers <= 255, so the bf16 recast is lossless
        img = img / 255.0
    else:
        spr = sprites.astype(jnp.float32)
        oy = _placement(y, h, spr.shape[-1], jnp.float32)
        ox = _placement(x, w, spr.shape[-1], jnp.float32)
        # float sprites may use full f32 mantissas: keep the contraction
        # exact with HIGHEST (each output is still a single product)
        kw = dict(precision=jax.lax.Precision.HIGHEST)
        rows = jnp.einsum("bdshk,bdkj->bdshj", oy, spr, **kw)
        img = jnp.einsum("bdshj,bdswj->bdshw", rows, ox, **kw)
    frames = jnp.clip(jnp.sum(img, axis=1), 0.0, 1.0)
    return frames[..., None]  # (B, S, H, W, 1)


def as_frames(batch, image_size: int):
    """Normalize any trainer batch format to (B, S, H, W, C) float32 [0,1].

    Accepts: a trajectory dict {'sprites', 'pos'} (composited on device),
    a uint8 pixel batch (normalized on device), or float pixels (passed
    through). Centralizes the format dispatch so every consumer — train
    step, eval rollout, shape probe — shares one code path.
    """
    if isinstance(batch, dict):
        return composite_clips(batch["sprites"], batch["pos"], image_size)
    frames = jnp.asarray(batch)
    if frames.dtype == jnp.uint8:
        return frames.astype(jnp.float32) / 255.0
    return frames
