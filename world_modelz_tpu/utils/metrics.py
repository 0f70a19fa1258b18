"""Quantitative evaluation metrics.

The reference judges results qualitatively (PNG grids / GIFs,
results/README.md); this module adds the standard numeric counterparts used
for reconstruction/rollout parity claims:

- :func:`psnr` — peak signal-to-noise ratio per batch.
- :func:`ssim` — structural similarity (uniform-window variant).
- :func:`codebook_usage` — active-code fraction and perplexity from VQ
  activation counts (the reference's perplexity/health metrics, vq.py:71-73,
  train_vqae.py:204-208, as a summary).

All functions are jit-able jnp ops.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp


def psnr(a: jnp.ndarray, b: jnp.ndarray, max_val: float = 1.0) -> jnp.ndarray:
    """Mean PSNR (dB) over the batch; inputs (B, ...) in [0, max_val]."""
    axes = tuple(range(1, a.ndim))
    mse = jnp.mean((a - b) ** 2, axis=axes)
    return jnp.mean(20.0 * jnp.log10(max_val) - 10.0 * jnp.log10(mse + 1e-12))


def _uniform_filter(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Mean filter over the two spatial dims of (B, H, W, C)."""
    kernel = jnp.ones((size, size), x.dtype) / (size * size)
    from jax import lax

    return lax.conv_general_dilated(
        x.transpose(0, 3, 1, 2).reshape(-1, 1, *x.shape[1:3]),
        kernel[None, None],
        window_strides=(1, 1),
        padding="VALID",
    ).reshape(x.shape[0], x.shape[3], x.shape[1] - size + 1, -1).transpose(
        0, 2, 3, 1
    )


def ssim(
    a: jnp.ndarray,
    b: jnp.ndarray,
    max_val: float = 1.0,
    window: int = 7,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over a batch of (B, H, W, C) images (uniform window)."""
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    mu_a = _uniform_filter(a, window)
    mu_b = _uniform_filter(b, window)
    var_a = _uniform_filter(a * a, window) - mu_a**2
    var_b = _uniform_filter(b * b, window) - mu_b**2
    cov = _uniform_filter(a * b, window) - mu_a * mu_b
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    )
    return jnp.mean(s)


def codebook_usage(activation_count: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Summary of VQ codebook health from (L, K) activation counts."""
    total = jnp.sum(activation_count, axis=-1, keepdims=True)
    p = activation_count / jnp.maximum(total, 1)
    perplexity = jnp.exp(
        -jnp.sum(p * jnp.log(p + 1e-10), axis=-1)
    )  # per latent
    active = jnp.mean((activation_count > 0).astype(jnp.float32), axis=-1)
    return {
        "perplexity": jnp.mean(perplexity),
        "active_fraction": jnp.mean(active),
    }
