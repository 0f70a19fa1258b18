"""On-device MovingMNIST compositing — ship trajectories, not pixels.

The host generator (data/moving_mnist.py, parity with
vq-video-diffusion/data/moving_mnist.py:38-95) composites digit sprites
into (S, H, W, 1) pixel clips on the CPU and ships them to the device.
At the production configuration (batch 64, 10-step fused dispatch) that
is ~28 MB of uint8 frames per dispatch over the TPU relay; the underlying
information is two 24x24 sprites and a handful of (y, x) positions per
clip — ~1 KB. This module moves the O(S*H*W) compositing into the jitted
train step so only the trajectories cross host->device.

Semantics match the native host compositor exactly
(data/_native/compositor.cpp `composite_sprite` + `clamp01`): sprites are
ADDED into a zero canvas at per-frame top-left (y, x) offsets, then the
frame is clamped to [0, 1]. Off-canvas sprite regions are clipped (the
bounce dynamics never produce them, but the gather masks them anyway).

The kernel is pure dense gathers (two `take_along_axis` passes) — no
scatter, no dynamic shapes — so XLA fuses it into the surrounding
tokenizer convolutions on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


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
    spr = sprites.astype(jnp.float32)
    if sprites.dtype == jnp.uint8:
        spr = spr / 255.0
    b, d, k, _ = spr.shape
    s = pos.shape[2]
    h = w = image_size

    y = pos[..., 0]  # (B, D, S)
    x = pos[..., 1]
    # canvas row/col -> sprite row/col, per (clip, digit, frame)
    ry = jnp.arange(h, dtype=pos.dtype)[None, None, None, :] - y[..., None]
    rx = jnp.arange(w, dtype=pos.dtype)[None, None, None, :] - x[..., None]
    valid = (
        ((ry >= 0) & (ry < k))[..., :, None]
        & ((rx >= 0) & (rx < k))[..., None, :]
    )  # (B, D, S, H, W)
    ryc = jnp.clip(ry, 0, k - 1)
    rxc = jnp.clip(rx, 0, k - 1)

    spr_b = jnp.broadcast_to(spr[:, :, None], (b, d, s, k, k))
    rows = jnp.take_along_axis(spr_b, ryc[..., None], axis=3)  # (B,D,S,H,K)
    img = jnp.take_along_axis(
        rows, rxc[..., None, :], axis=4
    )  # (B, D, S, H, W)
    frames = jnp.clip(jnp.sum(img * valid, axis=1), 0.0, 1.0)
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
