"""Loss-aware diffusion-time importance sampling as explicit state.

Parity with `LossAwareSamplerEma` / `UniformSampler`
(minecraft/importance_sampling.py:5-67): a 100-bucket histogram of per-sample
losses over diffusion time r in [0,1]; sampling draws buckets proportional to
EMA'd losses (mixed with a uniform floor) once every bucket has seen more than
`warmup` samples.

TPU-first: the reference updates the histogram with a host-side Python loop
over the batch (importance_sampling.py:40-41 — a per-step host sync). Here
both `sample` and `update` are jit-able pure functions on a
:class:`LossAwareSamplerState`, so they fold into the device train step; the
sequential-EMA semantics of the reference loop are reproduced exactly with a
`lax.scan` over the batch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class LossAwareSamplerState:
    weights: jnp.ndarray  # (num_buckets,) float32 EMA of per-bucket loss
    counts: jnp.ndarray  # (num_buckets,) int32 samples seen per bucket
    uniform_p: jnp.ndarray  # scalar: uniform mixture floor
    alpha: jnp.ndarray  # scalar: EMA decay
    warmup: jnp.ndarray  # scalar int: per-bucket warmup count


def loss_aware_init(
    num_buckets: int = 100,
    uniform_p: float = 0.01,
    alpha: float = 0.9,
    warmup: int = 10,
) -> LossAwareSamplerState:
    return LossAwareSamplerState(
        weights=jnp.ones((num_buckets,), jnp.float32),
        counts=jnp.zeros((num_buckets,), jnp.int32),
        uniform_p=jnp.float32(uniform_p),
        alpha=jnp.float32(alpha),
        warmup=jnp.int32(warmup),
    )


def loss_aware_warmed_up(state: LossAwareSamplerState) -> jnp.ndarray:
    """True once every bucket has seen more than `warmup` samples
    (importance_sampling.py:43-44)."""
    return jnp.all(state.counts > state.warmup)


def loss_aware_weights(state: LossAwareSamplerState) -> jnp.ndarray:
    """Normalized sampling weights with uniform floor
    (importance_sampling.py:17-23); uniform until warmed up."""
    n = state.weights.shape[0]
    w = state.weights / jnp.sum(state.weights)
    w = (1.0 - state.uniform_p) * w + state.uniform_p / n
    uniform = jnp.full((n,), 1.0 / n, jnp.float32)
    return jnp.where(loss_aware_warmed_up(state), w, uniform)


def loss_aware_sample(
    state: LossAwareSamplerState,
    key: jax.Array,
    batch_size: int,
    jitter: bool = True,
) -> jnp.ndarray:
    """Draw diffusion times r in [0, 1) (importance_sampling.py:25-32)."""
    n = state.weights.shape[0]
    k_bucket, k_jitter = jax.random.split(key)
    w = loss_aware_weights(state)
    buckets = jax.random.categorical(
        k_bucket, jnp.log(w + 1e-20), shape=(batch_size,)
    ).astype(jnp.float32)
    if jitter:
        u = jax.random.uniform(k_jitter, (batch_size,))
        return (buckets + u) / n
    return buckets / (n - 1)


def loss_aware_update(
    state: LossAwareSamplerState,
    ts: jnp.ndarray,
    losses: jnp.ndarray,
) -> LossAwareSamplerState:
    """EMA the histogram with this batch's per-sample losses.

    Reproduces the sequential per-sample EMA of importance_sampling.py:34-41
    (multiple hits to the same bucket in one batch apply the EMA repeatedly,
    in batch order) via lax.scan — fully on-device, no host sync.
    """
    n = state.weights.shape[0]
    ts = ts.reshape(-1)
    losses = losses.reshape(-1)
    indices = jnp.clip((ts * n).astype(jnp.int32), 0, n - 1)
    counts = state.counts.at[indices].add(1)

    def body(weights, idx_loss):
        idx, loss = idx_loss
        new_w = weights.at[idx].set(
            weights[idx] * state.alpha + loss * (1.0 - state.alpha)
        )
        return new_w, None

    weights, _ = jax.lax.scan(body, state.weights, (indices, losses))
    return state.replace(weights=weights, counts=counts)


def uniform_sample(key: jax.Array, batch_size: int) -> jnp.ndarray:
    """Null-object sampler (importance_sampling.py:50-57)."""
    return jax.random.uniform(key, (batch_size,))
