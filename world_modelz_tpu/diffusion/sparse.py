"""Sparse space-time diffusion: position sampling and volume denoising.

Parity with minecraft/sparse_diffusion.py:
- `sample_flat_positions` (:31-41): uniform random token subsets without
  replacement.
- `sample_time_dependent` (:44-72): diffusion-time-conditioned temporal
  windows — for small t positions are drawn from a narrow band of frames,
  approaching the whole clip as t -> 1. This is the repo's long-context
  mechanism (SURVEY.md §5).
- `sparse_denoise_volume` (:139-202): inference sweep that covers the full
  S*H*W token volume in `num_context`-sized chunks per iteration, scattering
  denoised draws back.

TPU-first: the reference draws per-row `torch.randperm` in a Python loop
(:69-72) — a host sync per batch row per step. Here sampling-without-
replacement inside a variable-size window is a fixed-shape argsort trick
(uniform keys, positions outside the window pushed to +inf), vmapped over
the batch; everything jits.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


def sample_flat_positions(
    key: jax.Array,
    batch_size: int,
    context_length: int,
    volume: int,
) -> jnp.ndarray:
    """(B, N) distinct flat positions drawn uniformly from [0, volume)
    (sparse_diffusion.py:31-41; requires context_length <= volume).

    DELIBERATE DEVIATION from the reference: it slices a SINGLE randperm of
    the volume across the whole batch (rows are mutually disjoint until the
    permutation is exhausted, then a fresh one is drawn mid-row); here each
    row is an independent uniform sample without replacement. Within a row
    both are identical (uniform w/o replacement); across rows the reference
    couples samples as an artifact of its fill loop. The independent form
    matches the documented intent ("random token subsets"), jits with fixed
    shapes, and removes the cross-row coupling. Training only ever uses
    sampling_type="neighbors" (sample_time_dependent) by default, where the
    reference is per-row independent too."""
    keys = jax.random.split(key, batch_size)

    def one(k):
        u = jax.random.uniform(k, (volume,))
        return jnp.argsort(u)[:context_length]

    return jax.vmap(one)(keys).astype(jnp.int32)


def sample_time_dependent(
    key: jax.Array,
    batch_size: int,
    context_length: int,
    shape: Tuple[int, int, int],
    t: jnp.ndarray,
    o: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Sample positions from a diffusion-time-dependent temporal window.

    Faithful to sparse_diffusion.py:44-72: the window length (in frames)
    grows from ceil(N / (H*W)) to the whole clip as t -> 1; its offset is
    uniform (or given via `o` during the eval sweep, :177-179); positions
    inside the window are drawn without replacement.

    Args:
      key: PRNG key.
      t: (B,) diffusion times.
      o: optional (B,) window-offset fractions in [0, 1).

    Returns:
      (B, context_length) int32 flat positions into the S*H*W volume.
    """
    s, h, w = shape
    hw = h * w
    volume = s * hw
    t = jnp.clip(t.reshape(-1), 0.0, 1.0)

    min_window = -(-context_length // hw)  # ceil
    if not min_window < s:
        raise ValueError(
            f"context_length {context_length} needs more than the {s} "
            "available frames"
        )

    k_o, k_perm = jax.random.split(key)
    window = jnp.floor(min_window + t * (s - min_window + 1))
    window = jnp.minimum(window, s - min_window)  # (:59)
    if o is None:
        o = jax.random.uniform(k_o, (batch_size,))
    else:
        o = jnp.clip(o.reshape(-1), 0.0, 1.0 - 1e-5)
    offset = jnp.floor(o * (s - window + 1)).astype(jnp.int32) * hw
    window_tokens = window.astype(jnp.int32) * hw

    pos = jax.lax.broadcasted_iota(jnp.int32, (batch_size, volume), 1)
    u = jax.random.uniform(k_perm, (batch_size, volume))
    # positions beyond the window sort last; the first `context_length`
    # ranks are then a uniform sample w/o replacement from [0, window)
    u = jnp.where(pos < window_tokens[:, None], u, 2.0)
    picks = jnp.argsort(u, axis=-1)[:, :context_length].astype(jnp.int32)
    return picks + offset[:, None]


def sparse_denoise_volume(
    key: jax.Array,
    logits_fn: Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray],
    *,
    batch_size: int,
    shape: Tuple[int, int, int],
    num_classes: int,
    mask_token: int,
    num_context: int = 512,
    num_iterations: int = 100,
    sampling_type: str = "neighbors",
) -> jnp.ndarray:
    """Generate a full token volume by sparse chunked denoising.

    Functional form of the sparse `evaluate_model`
    (sparse_diffusion.py:139-202): start all-mask; for each of
    `num_iterations` rounds, sweep the volume in `num_context`-chunks (chunk
    offsets visited in random order), re-mask a `1 - alpha` fraction of each
    chunk, draw replacements from the model, scatter back.

    Note: the reference's "uniform" eval branch slices a permutation at
    `k * max_index` (:174-175), which yields empty chunks for k >= 1 — only
    the first chunk is ever denoised per iteration. We implement the evident
    intent (stride `num_context` through one permutation per round); the
    default "neighbors" branch is faithful as-is.

    Returns:
      (B, S, H, W) int32 token volume (entries < num_classes).
    """
    s, h, w = shape
    volume = s * h * w
    offset_count = volume // num_context + 1

    def gather(full_flat, indices):
        return jnp.take_along_axis(full_flat, indices, axis=1)

    def scatter(full_flat, indices, values):
        b = full_flat.shape[0]
        row = jax.lax.broadcasted_iota(jnp.int32, indices.shape, 0)
        return full_flat.at[row, indices].set(values)

    def chunk_body(k, carry, frac, perm, offset_order, key):
        full_flat, key = carry
        key, k_idx, k_mask, k_draw = jax.random.split(key, 4)

        if sampling_type == "uniform":
            start = (k * num_context) % volume
            indices = jnp.roll(perm, -start, axis=1)[:, :num_context]
        elif sampling_type == "neighbors":
            o = (offset_order[k].astype(jnp.float32) / (offset_count - 1))
            indices = sample_time_dependent(
                k_idx,
                batch_size,
                num_context,
                shape,
                jnp.full((batch_size,), 1.0 - frac),
                o=jnp.full((batch_size,), o),
            )
        else:
            raise ValueError(f"unsupported sampling_type: {sampling_type!r}")

        inp = gather(full_flat, indices)
        alpha = jnp.clip(frac, 0.0, 1.0)
        mask = jax.random.uniform(k_mask, inp.shape) > alpha
        inp = jnp.where(mask, mask_token, inp)

        logits = logits_fn(inp, indices)  # (B, N, K)
        draws = jax.random.categorical(k_draw, logits, axis=-1).astype(
            jnp.int32
        )
        full_flat = scatter(full_flat, indices, draws)
        return full_flat, key

    def iter_body(i, carry):
        full_flat, key = carry
        key, k_perm, k_order, k_chunks = jax.random.split(key, 4)
        frac = i / (num_iterations - 1.0)
        perm = jax.vmap(
            lambda k: jax.random.permutation(k, volume).astype(jnp.int32)
        )(jax.random.split(k_perm, batch_size))
        offset_order = jax.random.permutation(k_order, offset_count)

        def inner(k, c):
            return chunk_body(k, c, frac, perm, offset_order, k_chunks)

        full_flat, key = jax.lax.fori_loop(
            0, offset_count, inner, (full_flat, key)
        )
        return full_flat, key

    full_flat = jnp.full((batch_size, volume), mask_token, jnp.int32)
    full_flat, _ = jax.lax.fori_loop(
        0, num_iterations, iter_body, (full_flat, key)
    )
    return full_flat.reshape(batch_size, s, h, w)
