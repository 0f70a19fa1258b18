"""Masked discrete diffusion: corruption process and iterative unmask sampling.

Parity with the reference's inline implementations:
- training corruption (C22): per-example diffusion time r, Bernoulli(r)
  masking plus a uniform-resample perturbation
  (vq-video-diffusion/main.py:246-259, minecraft/sparse_diffusion.py:440-449)
- inference reverse process (C23): iterative unmasking with a growing keep
  fraction (minecraft/main2.py:85-131), optional top-k logit filtering
  (main2.py:40-44), and multi-frame autoregressive rollout (main2.py:128-129).

TPU-first details:
- The reference materializes a (B, N, K) categorical table and calls
  torch.multinomial to apply the uniform perturbation (main.py:251-255).
  Mathematically `d = lerp(onehot(x), uniform, a)` is the mixture
  "with probability a draw uniformly, else keep x" — so we sample one
  Bernoulli + one uniform class per position and never build the table.
- The 30-iteration unmask loop is a `lax.fori_loop` with
  `jax.random.categorical` draws; the whole frame sampler jits into one XLA
  program (the reference re-launches Python per iteration).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def corrupt_tokens(
    key: jax.Array,
    tokens: jnp.ndarray,
    r: jnp.ndarray,
    *,
    num_classes: int,
    mask_token: int,
    p_max_uniform: float = 0.1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Apply the forward (corruption) process to clean tokens.

    Args:
      key: PRNG key.
      tokens: (B, N) int tokens in [0, num_classes).
      r: (B,) diffusion times in [0, 1].
      num_classes: codebook size.
      mask_token: index used for masked positions (== num_classes).
      p_max_uniform: max uniform-resample probability (main2.py:221).

    Returns:
      (corrupted tokens (B, N), mask (B, N) bool — True where masked).
    """
    k_mask, k_bern, k_uni = jax.random.split(key, 3)
    b, n = tokens.shape
    r = r.reshape(b, 1)

    # Bernoulli(r) masking (main.py:249)
    mask = jax.random.uniform(k_mask, (b, n)) < r

    # uniform perturbation: with prob r * p_max_uniform resample uniformly
    # (equivalent to drawing from lerp(onehot, uniform, r*p_max_uniform),
    # main.py:251-255)
    resample = jax.random.uniform(k_bern, (b, n)) < r * p_max_uniform
    uniform_draw = jax.random.randint(k_uni, (b, n), 0, num_classes)
    corrupted = jnp.where(resample, uniform_draw, tokens)

    corrupted = jnp.where(mask, mask_token, corrupted)
    return corrupted, mask


def top_k_logits(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Keep the k largest logits per row, set the rest to -inf
    (main2.py:40-44)."""
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def unmask_frame(
    key: jax.Array,
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    context: jnp.ndarray,
    *,
    num_classes: int,
    mask_token: int,
    num_iterations: int = 30,
    sample_topk: int = -1,
    topk_from_iteration: int = 1,
) -> jnp.ndarray:
    """Iteratively denoise the (masked) last frame of a token-grid clip.

    Functional form of the reference's inner sampling loop
    (main2.py:89-124): starting from flat logits, repeatedly draw a
    candidate frame, re-mask a shrinking `1 - alpha` fraction, and query the
    model. On the final iteration nothing is re-masked, so the returned
    frame is fully denoised.

    Args:
      key: PRNG key.
      logits_fn: tokens (B, S, H, W) -> last-frame logits (B, H, W, K).
      context: (B, S, H, W) int tokens; the last frame is overwritten.
      num_iterations: reference fixes 30 (main2.py:81).
      sample_topk: if > 0, top-k filter the logits from iteration
        `topk_from_iteration` on (main2.py:97-98; the MovingMNIST variant
        applies it from iteration 0, main.py:83-84 — pass 0 to match).

    Returns:
      (B, H, W) denoised last-frame tokens.
    """
    b, s, h, w = context.shape

    def body(i, carry):
        batch_z, logits, key = carry
        key, k_draw, k_mask = jax.random.split(key, 3)

        use_topk = jnp.logical_and(
            sample_topk > 0, i >= topk_from_iteration
        )
        filtered = (
            top_k_logits(logits, sample_topk) if sample_topk > 0 else logits
        )
        logits_eff = jnp.where(use_topk, filtered, logits)

        draw = jax.random.categorical(
            k_draw, logits_eff.reshape(-1, num_classes), axis=-1
        ).reshape(b, h, w)

        frac = (i + 1.0) / num_iterations
        alpha = jnp.clip(frac, 0.0, 1.0)
        mask = jax.random.uniform(k_mask, (b, h, w)) > alpha
        draw = jnp.where(mask, mask_token, draw)

        batch_z = batch_z.at[:, -1].set(draw)
        # f32: sampling math stays full-precision, and the loop carry dtype
        # is independent of the model's compute dtype (bf16 params would
        # otherwise break the scan's carry-type invariance)
        logits = logits_fn(batch_z).astype(jnp.float32)
        return batch_z, logits, key

    init_logits = jnp.zeros((b, h, w, num_classes), jnp.float32)
    batch_z = context.at[:, -1].set(mask_token)
    batch_z, logits, key = jax.lax.fori_loop(
        0, num_iterations, body, (batch_z, init_logits, key)
    )
    # the final body iteration has alpha == 1 -> no re-masking, and
    # batch_z[:, -1] holds that final draw (main2.py:121-126)
    return batch_z[:, -1]


def rollout_frames(
    key: jax.Array,
    logits_fn: Callable[[jnp.ndarray], jnp.ndarray],
    context: jnp.ndarray,
    *,
    num_frames: int,
    num_classes: int,
    mask_token: int,
    num_iterations: int = 30,
    sample_topk: int = -1,
) -> jnp.ndarray:
    """Autoregressive multi-frame rollout (main2.py:85-131).

    Generates `num_frames` new frames, each by `unmask_frame`, shifting the
    context window by one frame after each (main2.py:128-129).

    Returns:
      (B, num_frames, H, W) generated token frames.
    """

    def step(carry, _):
        context, key = carry
        key, sub = jax.random.split(key)
        frame = unmask_frame(
            sub,
            logits_fn,
            context,
            num_classes=num_classes,
            mask_token=mask_token,
            num_iterations=num_iterations,
            sample_topk=sample_topk,
        )
        context = jnp.concatenate(
            [context[:, 1:-1], frame[:, None], context[:, -1:]], axis=1
        )
        # shift: dropped oldest frame, appended the new one; last slot is
        # re-masked by the next unmask_frame call
        return (context, key), frame

    (_, _), frames = jax.lax.scan(
        step, (context, key), None, length=num_frames
    )
    return jnp.moveaxis(frames, 0, 1)  # (B, T, H, W)
