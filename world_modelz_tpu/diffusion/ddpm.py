"""Continuous Gaussian DDPM: cosine schedule, eps-prediction training,
x0-reprojection sampling.

Parity with som-diffusion/train_diffusion.py:
- cosine alpha-bar schedule with s = 0.008 (:20-22, Nichol & Dhariwal eq.)
- training: t ~ U[0,1], x_t = sqrt(a) x0 + sqrt(1-a) eps, MSE on eps
  (:115-127)
- sampling: the reference's custom reverse loop (:25-68) — at each step
  re-noise the current x0 estimate at the schedule time, predict eps,
  reproject to x0, clamp to [-1.25, 1.25]; alpha-scaling is skipped for the
  first 10% of progress (:44-47, 54-57).

TPU-first: the sampler is a `lax.scan` over timesteps returning the trace at
requested intervals; one compiled program.
"""

from __future__ import annotations

import math
from typing import Callable, Tuple

import jax
import jax.numpy as jnp

_S = 0.008


def alpha_bar(t: jnp.ndarray) -> jnp.ndarray:
    """Cosine cumulative signal level (train_diffusion.py:20-22)."""
    return jnp.cos((t + _S) / (1 + _S) * math.pi * 0.5) ** 2


def ddpm_corrupt(
    key: jax.Array, x0: jnp.ndarray, t: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward process sample: returns (x_t, eps) (train_diffusion.py:115-124).

    t has shape (B,) or (B, 1); broadcast over trailing dims.
    """
    a = alpha_bar(t.reshape(-1, *([1] * (x0.ndim - 1))))
    eps = jax.random.normal(key, x0.shape, x0.dtype)
    xt = x0 * jnp.sqrt(a) + eps * jnp.sqrt(1.0 - a)
    return xt, eps


def ddpm_sample(
    key: jax.Array,
    eps_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    shape: Tuple[int, ...],
    *,
    timesteps: int = 1000,
    trace_steps: int = 20,
    clip: float = 1.25,
) -> jnp.ndarray:
    """Generate samples with the reference's x0-reprojection loop
    (train_diffusion.py:25-68).

    Args:
      eps_fn: (x_t (B,...), t (B,1)) -> eps prediction.
      shape: output shape including batch.

    Returns:
      (trace_steps, *shape) trace of x0 estimates; the last entry is the
      final sample.
    """
    batch = shape[0]

    def body(carry, step):
        x0, key = carry
        key, k_eps = jax.random.split(key)
        f = step / (timesteps - 1.0)
        t = jnp.full((batch, 1), 1.0 - f)
        a = alpha_bar(t.reshape(-1, *([1] * (len(shape) - 1))))

        eps = jax.random.normal(k_eps, shape)
        noise = eps * jnp.sqrt(1.0 - a)
        # alpha-scaling only after 10% progress (:44-47)
        scale = jnp.where(f > 0.1, jnp.sqrt(a), 1.0)
        x = x0 * scale + noise

        noise_estimate = eps_fn(x, t)
        x0_new = x - noise_estimate * jnp.sqrt(1.0 - a)
        x0_new = jnp.where(f > 0.1, x0_new / jnp.sqrt(a), x0_new)
        x0_new = jnp.clip(x0_new, -clip, clip)
        return (x0_new, key), x0_new

    x0 = jnp.zeros(shape, jnp.float32)
    (_, _), xs = jax.lax.scan(
        body, (x0, key), jnp.arange(timesteps, dtype=jnp.float32)
    )
    # evenly spaced trace including the final step
    idx = jnp.linspace(0, timesteps - 1, trace_steps).astype(jnp.int32)
    return xs[idx]
