"""Batched 2D self-organizing map as pure functions.

Capability parity with `SomLayer` (som-diffusion/som.py:8-159): best-matching-
unit search by squared L2, index <-> normalized [-1,1]^2 coordinate codecs,
Gaussian-neighborhood `adapt` updates processed in sequential chunks, and
activation statistics.

TPU-first: all state is an explicit :class:`SomState`; `adapt`'s Python chunk
loop (som.py:131-157) becomes a `lax.scan` over fixed-size chunks with a
validity mask for the ragged tail — one compiled program regardless of input
size, and the sequential chunk semantics (each chunk sees the embeddings
moved by the previous one) are preserved exactly. Coordinates use NHWC
layouts: `encode_2d` returns (..., 2) with channels last (the reference
returns Bx2xHxW, som.py:51).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SomState:
    embedding: jnp.ndarray  # (width*height, embedding_dim)
    activation_count: jnp.ndarray  # (width*height,) int32
    width: int = struct.field(pytree_node=False)
    height: int = struct.field(pytree_node=False)

    @property
    def embedding_dim(self) -> int:
        return self.embedding.shape[1]


def som_init(
    key: jax.Array, *, width: int, height: int, embedding_dim: int
) -> SomState:
    """Uniform(-0.1, 0.1) map init (som.py:21)."""
    emb = jax.random.uniform(
        key, (width * height, embedding_dim), minval=-0.1, maxval=0.1
    )
    return SomState(
        embedding=emb,
        activation_count=jnp.zeros((width * height,), jnp.int32),
        width=width,
        height=height,
    )


def _pos_map(state: SomState) -> jnp.ndarray:
    """(K, 2) integer (x, y) map coordinates (som.py:23-25)."""
    k = state.width * state.height
    idx = jnp.arange(k)
    return jnp.stack([idx % state.width, idx // state.width], axis=-1).astype(
        jnp.float32
    )


def som_encode(state: SomState, x: jnp.ndarray) -> jnp.ndarray:
    """BMU indices, shape x.shape[:-1] (som.py:84-99)."""
    flat = x.reshape(-1, state.embedding_dim)
    distances = (
        jnp.sum(flat**2, axis=1, keepdims=True)
        + jnp.sum(state.embedding**2, axis=1)
        - 2.0
        * jnp.dot(flat, state.embedding.T, preferred_element_type=jnp.float32)
    )
    return jnp.argmin(distances, axis=1).astype(jnp.int32).reshape(
        x.shape[:-1]
    )


def som_decode(state: SomState, indices: jnp.ndarray) -> jnp.ndarray:
    """Map lookup (som.py:102-104)."""
    return jnp.take(state.embedding, indices, axis=0, mode="clip")


def encode_indices_2d(state: SomState, indices: jnp.ndarray) -> jnp.ndarray:
    """BMU index -> normalized (x, y) in [-1, 1]^2, pixel centers
    (som.py:30-51); output (..., 2) channels-last."""
    x = (indices % state.width).astype(jnp.float32)
    y = (indices // state.width).astype(jnp.float32)
    x = (x - (state.width / 2 - 0.5)) / (state.width / 2)
    y = (y - (state.height / 2 - 0.5)) / (state.height / 2)
    return jnp.stack([x, y], axis=-1)


def decode_indices_2d(state: SomState, pos: jnp.ndarray) -> jnp.ndarray:
    """Normalized (x, y) -> BMU index (som.py:53-71); input (..., 2)."""
    eps = 1e-6
    pos = jnp.clip(pos, -1 + eps, 1 - eps)
    x = jnp.floor(pos[..., 0] * (state.width / 2) + state.width / 2)
    y = jnp.floor(pos[..., 1] * (state.height / 2) + state.height / 2)
    return (y * state.width + x).astype(jnp.int32)


def som_encode_2d(state: SomState, x: jnp.ndarray) -> jnp.ndarray:
    """(..., D) -> (..., 2) normalized coordinates (som.py:73-76)."""
    return encode_indices_2d(state, som_encode(state, x))


def som_decode_2d(state: SomState, pos: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) -> (..., D) map vectors (som.py:78-81)."""
    return som_decode(state, decode_indices_2d(state, pos))


def som_forward(
    state: SomState, x: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Straight-through quantization + squared diff (som.py:106-111)."""
    bmu = som_encode(state, x)
    quantized = som_decode(state, bmu)
    st = x + jax.lax.stop_gradient(quantized - x)
    diff = jnp.mean((jax.lax.stop_gradient(quantized) - x) ** 2)
    return st, diff


def som_adapt(
    state: SomState,
    x: jnp.ndarray,
    alpha: float,
    sigma: float,
    adapt_batch_size: int = 256,
    stats: bool = True,
) -> Tuple[SomState, jnp.ndarray]:
    """Gaussian-neighborhood SOM update (som.py:122-159).

    Sequential over chunks of `adapt_batch_size` inputs: each chunk finds its
    BMUs against the embeddings as updated by the previous chunk, then pulls
    every map vector toward the chunk mean weighted by
    exp(-d((x,y), bmu)^2 / sigma^2).

    Returns (new_state, mean squared quantization error per element).
    """
    alpha = jnp.maximum(alpha, 0.0)
    sigma = jnp.maximum(sigma, 1e-6)

    flat = x.reshape(-1, state.embedding_dim)
    n = flat.shape[0]
    c = min(adapt_batch_size, n)
    num_chunks = -(-n // c)
    padded = jnp.zeros((num_chunks * c, state.embedding_dim), flat.dtype)
    padded = padded.at[:n].set(flat)
    valid = (jnp.arange(num_chunks * c) < n).astype(jnp.float32)

    chunks = padded.reshape(num_chunks, c, state.embedding_dim)
    weights = valid.reshape(num_chunks, c)
    pos_map = _pos_map(state)  # (K, 2)

    def body(carry, inp):
        emb, act = carry
        xc, w = inp  # (C, D), (C,)
        dist = (
            jnp.sum(xc**2, axis=1, keepdims=True)
            + jnp.sum(emb**2, axis=1)
            - 2.0 * jnp.dot(xc, emb.T, preferred_element_type=jnp.float32)
        )
        bmu = jnp.argmin(dist, axis=1)  # (C,)
        q = jnp.take(emb, bmu, axis=0)
        err = jnp.sum(w * jnp.sum((xc - q) ** 2, axis=-1))

        if stats:
            act = act.at[bmu].add(w.astype(jnp.int32))

        bmu_pos = jnp.stack(
            [
                (bmu % state.width).astype(jnp.float32),
                (bmu // state.width).astype(jnp.float32),
            ],
            axis=-1,
        )  # (C, 2)
        d2 = jnp.sum(
            (pos_map[None, :, :] - bmu_pos[:, None, :]) ** 2, axis=-1
        )  # (C, K)
        nbhd = jnp.exp(-d2 / (sigma**2)) * w[:, None]  # masked padding
        # delta = mean over chunk of nbhd * (x - emb)  (som.py:156)
        delta = (
            jnp.einsum("ck,cd->kd", nbhd, xc)
            - jnp.sum(nbhd, axis=0)[:, None] * emb
        ) / jnp.maximum(jnp.sum(w), 1.0)
        emb = emb + alpha * delta
        return (emb, act), err

    (emb, act), errs = jax.lax.scan(
        body, (state.embedding, state.activation_count), (chunks, weights)
    )
    error = jnp.sum(errs) / (n * state.embedding_dim)
    return state.replace(embedding=emb, activation_count=act), error


def som_reset_stats(state: SomState) -> SomState:
    return state.replace(
        activation_count=jnp.zeros_like(state.activation_count)
    )
