"""Tests for masked corruption, unmask sampling, and sparse position
sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from world_modelz_tpu.diffusion import (
    corrupt_tokens,
    rollout_frames,
    sample_flat_positions,
    sample_time_dependent,
    sparse_denoise_volume,
    top_k_logits,
    unmask_frame,
)

K = 16
MASK = K


def test_corrupt_extremes():
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (4, 64), 0, K)

    # r = 0: nothing masked, nothing resampled
    out, mask = corrupt_tokens(
        key, tokens, jnp.zeros((4,)), num_classes=K, mask_token=MASK
    )
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tokens))
    assert not bool(mask.any())

    # r = 1: everything masked
    out, mask = corrupt_tokens(
        key, tokens, jnp.ones((4,)), num_classes=K, mask_token=MASK
    )
    assert bool(mask.all())
    assert bool((out == MASK).all())


def test_corrupt_mask_rate_tracks_r():
    key = jax.random.PRNGKey(1)
    tokens = jnp.zeros((8, 4096), jnp.int32)
    r = jnp.full((8,), 0.3)
    _, mask = corrupt_tokens(key, tokens, r, num_classes=K, mask_token=MASK)
    rate = float(jnp.mean(mask.astype(jnp.float32)))
    assert 0.27 < rate < 0.33


def test_corrupt_uniform_perturbation_rate():
    key = jax.random.PRNGKey(2)
    tokens = jnp.zeros((8, 4096), jnp.int32)
    r = jnp.ones((8,))  # resample prob = p_max_uniform
    out, _ = corrupt_tokens(
        key, tokens, r, num_classes=K, mask_token=MASK, p_max_uniform=0.5
    )
    # all masked at r=1; test resampling via r slightly below 1
    r = jnp.full((8,), 0.999)
    out, mask = corrupt_tokens(
        key, tokens, r, num_classes=K, mask_token=MASK, p_max_uniform=0.5
    )
    unmasked = np.asarray(out)[~np.asarray(mask)]
    # ~50% of unmasked positions resampled uniformly; of those, (K-1)/K differ
    changed = np.mean(unmasked != 0)
    assert 0.35 < changed < 0.6


def test_top_k_logits():
    logits = jnp.asarray([[1.0, 3.0, 2.0, 0.5]])
    out = np.asarray(top_k_logits(logits, 2))
    np.testing.assert_array_equal(np.isinf(out[0]), [True, False, False, True])
    assert out[0, 1] == 3.0 and out[0, 2] == 2.0


def test_unmask_frame_reaches_model_distribution():
    """With a model that always predicts class 7, sampling must return 7s."""

    def logits_fn(tokens):
        b, s, h, w = tokens.shape
        logits = jnp.full((b, h, w, K), -10.0)
        return logits.at[..., 7].set(10.0)

    key = jax.random.PRNGKey(3)
    context = jnp.zeros((2, 4, 4, 4), jnp.int32)
    frame = unmask_frame(
        key, logits_fn, context, num_classes=K, mask_token=MASK,
        num_iterations=8,
    )
    assert frame.shape == (2, 4, 4)
    np.testing.assert_array_equal(np.asarray(frame), np.full((2, 4, 4), 7))


def test_rollout_shapes_and_shift():
    calls = []

    def logits_fn(tokens):
        b, s, h, w = tokens.shape
        return jnp.zeros((b, h, w, K))

    key = jax.random.PRNGKey(4)
    context = jnp.zeros((1, 3, 4, 4), jnp.int32)
    frames = rollout_frames(
        key, logits_fn, context, num_frames=3, num_classes=K,
        mask_token=MASK, num_iterations=4,
    )
    assert frames.shape == (1, 3, 4, 4)
    assert int(frames.max()) < K  # no mask tokens in final frames


def test_sample_flat_positions_distinct():
    key = jax.random.PRNGKey(5)
    p = np.asarray(sample_flat_positions(key, 4, 32, 64))
    assert p.shape == (4, 32)
    for row in p:
        assert len(set(row.tolist())) == 32
        assert row.min() >= 0 and row.max() < 64


def test_sample_time_dependent_window_semantics():
    key = jax.random.PRNGKey(6)
    shape = (32, 4, 4)  # S, H, W
    hw = 16
    ctx = 64  # min_window = 4 frames

    # t = 0: window is exactly min_window frames starting at offset
    t = jnp.zeros((8,))
    p = np.asarray(sample_time_dependent(key, 8, ctx, shape, t))
    for row in p:
        frames = row // hw
        assert frames.max() - frames.min() <= 3  # within 4 frames
        assert len(set(row.tolist())) == ctx  # no replacement

    # t = 1: any frame reachable; with several draws, spread is wide
    t = jnp.ones((8,))
    p = np.asarray(sample_time_dependent(jax.random.PRNGKey(7), 8, ctx, shape, t))
    spread = max(row.max() - row.min() for row in p)
    assert spread > 20 * hw


def test_sample_time_dependent_offset_pins_window():
    key = jax.random.PRNGKey(8)
    shape = (32, 4, 4)
    t = jnp.zeros((2,))
    o = jnp.zeros((2,))  # offset 0 -> first frames
    p = np.asarray(sample_time_dependent(key, 2, 64, shape, t, o=o))
    assert p.max() < 4 * 16  # all inside the first 4 frames


def test_sparse_denoise_volume():
    def logits_fn(tokens, indices):
        b, n = tokens.shape
        logits = jnp.full((b, n, K), -10.0)
        return logits.at[..., 3].set(10.0)

    key = jax.random.PRNGKey(9)
    vol = sparse_denoise_volume(
        key,
        logits_fn,
        batch_size=1,
        shape=(8, 4, 4),
        num_classes=K,
        mask_token=MASK,
        num_context=32,
        num_iterations=6,
    )
    assert vol.shape == (1, 8, 4, 4)
    # the chunked sweep must cover the whole volume with model draws
    np.testing.assert_array_equal(np.asarray(vol), np.full((1, 8, 4, 4), 3))


def test_sparse_denoise_volume_uniform_sweep():
    def logits_fn(tokens, indices):
        b, n = tokens.shape
        logits = jnp.full((b, n, K), -10.0)
        return logits.at[..., 5].set(10.0)

    vol = sparse_denoise_volume(
        jax.random.PRNGKey(10),
        logits_fn,
        batch_size=2,
        shape=(4, 4, 4),
        num_classes=K,
        mask_token=MASK,
        num_context=16,
        num_iterations=4,
        sampling_type="uniform",
    )
    np.testing.assert_array_equal(np.asarray(vol), np.full((2, 4, 4, 4), 5))
