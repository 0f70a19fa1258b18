"""Tests for the evaluation metrics."""

import jax.numpy as jnp
import numpy as np

from world_modelz_tpu.utils.metrics import codebook_usage, psnr, ssim


def test_psnr_identity_and_scale(rng):
    a = jnp.asarray(rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32))
    assert float(psnr(a, a)) > 100  # near-infinite for identical
    noisy = a + 0.1
    p = float(psnr(a, noisy))
    np.testing.assert_allclose(p, -10 * np.log10(0.01), rtol=1e-3)


def test_ssim_bounds(rng):
    a = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32))
    assert float(ssim(a, a)) > 0.99
    b = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 1)).astype(np.float32))
    assert float(ssim(a, b)) < 0.5


def test_codebook_usage():
    counts = jnp.asarray([[4.0, 4.0, 0.0, 0.0]])
    m = codebook_usage(counts)
    np.testing.assert_allclose(float(m["active_fraction"]), 0.5)
    np.testing.assert_allclose(float(m["perplexity"]), 2.0, rtol=1e-4)
