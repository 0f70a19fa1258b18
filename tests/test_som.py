"""Tests for the SOM layer, SOM autoencoder, UNet, and continuous DDPM."""

import jax
import jax.numpy as jnp
import numpy as np

from world_modelz_tpu.diffusion.ddpm import alpha_bar, ddpm_corrupt, ddpm_sample
from world_modelz_tpu.models.som_autoencoder import SomAutoEncoder
from world_modelz_tpu.models.unet import (
    SimpleDiffusionModel,
    UNetDiffusionModel,
    timestep_embedding,
)
from world_modelz_tpu.ops.som import (
    decode_indices_2d,
    encode_indices_2d,
    som_adapt,
    som_decode,
    som_encode,
    som_forward,
    som_init,
)


def make_som(key=0, w=8, h=8, d=3):
    return som_init(jax.random.PRNGKey(key), width=w, height=h, embedding_dim=d)


def test_som_encode_decode():
    state = make_som()
    x = state.embedding[5][None, :] + 1e-4  # very close to code 5
    idx = som_encode(state, x)
    assert int(idx[0]) == 5
    np.testing.assert_allclose(
        np.asarray(som_decode(state, idx)), np.asarray(state.embedding[5:6])
    )


def test_som_2d_codec_roundtrip():
    state = make_som(w=16, h=8)
    idx = jnp.arange(16 * 8)
    pos = encode_indices_2d(state, idx)
    assert pos.shape == (128, 2)
    assert float(jnp.abs(pos).max()) <= 1.0
    back = decode_indices_2d(state, pos)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(idx))


def test_som_forward_straight_through():
    state = make_som()
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 3)), jnp.float32)

    def f(x):
        q, _ = som_forward(state, x)
        return jnp.sum(q)

    g = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(g), np.ones_like(g), rtol=1e-6)


def test_som_adapt_organizes_colors():
    """Classic SOM sanity check (som.py:162-198): after annealed adaption on
    random colors, neighboring map cells hold similar vectors."""
    import math

    state = make_som(w=8, h=8, d=3)
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.uniform(0, 1, (512, 3)), jnp.float32)

    steps = 30
    sigma0, sigma1 = 4.0, 0.5
    scale = math.log(sigma1 / sigma0)
    for i in range(steps):
        p = i / steps
        eta = 0.3 * (1 - p) + 0.05 * p
        sigma = sigma0 * math.exp(p * scale)
        state, err = som_adapt(state, data, eta, sigma, adapt_batch_size=128)
    assert float(err) < 0.05  # map covers the color cube

    # neighbor smoothness: adjacent cells closer than random pairs
    emb = np.asarray(state.embedding).reshape(8, 8, 3)
    neighbor_d = np.mean(
        np.linalg.norm(emb[:, 1:] - emb[:, :-1], axis=-1)
    )
    random_d = np.mean(
        np.linalg.norm(
            emb.reshape(-1, 3)[rng.permutation(64)]
            - emb.reshape(-1, 3),
            axis=-1,
        )
    )
    assert neighbor_d < 0.6 * random_d


def test_som_adapt_ragged_tail():
    """Input size not divisible by adapt_batch_size must work and count only
    real rows in the stats."""
    state = make_som()
    x = jnp.asarray(np.random.default_rng(1).normal(size=(37, 3)), jnp.float32)
    new, err = som_adapt(state, x, 0.1, 1.0, adapt_batch_size=16)
    assert int(jnp.sum(new.activation_count)) == 37
    assert np.isfinite(float(err))


def test_som_autoencoder_roundtrip():
    ae = SomAutoEncoder(
        embedding_dim=8, downscale_steps=2, hidden_planes=16,
        som_width=8, som_height=8, pass_through_som=True,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 16, 16, 3))
    state = ae.init(key, x)

    recon, h_in, h_diff, _ = ae.forward(state, x, train=False)
    assert recon.shape == x.shape
    assert h_in.shape == (2, 4, 4, 8)
    assert h_diff.shape == ()

    pos = ae.encode_2d(state, x)
    assert pos.shape == (2, 4, 4, 2)
    assert float(jnp.abs(pos).max()) <= 1.0
    y = ae.decode_2d(state, pos)
    assert y.shape == x.shape


def test_timestep_embedding_shape():
    emb = timestep_embedding(jnp.ones((4, 1)), 32)
    assert emb.shape == (4, 32)
    e0 = timestep_embedding(jnp.zeros((1, 1)), 32)
    e1 = timestep_embedding(jnp.ones((1, 1)), 32)
    assert not np.allclose(np.asarray(e0), np.asarray(e1))


def test_unet_forward_backward():
    model = UNetDiffusionModel(
        in_channels=2, out_channels=2, model_channels=32,
        num_res_blocks=1, channel_mult=(1, 2),
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 16, 2))
    t = jax.random.uniform(key, (2, 1))
    params = model.init(key, x, t)
    y = model.apply(params, x, t)
    assert y.shape == x.shape
    # zero-init output conv -> initial prediction is exactly zero
    np.testing.assert_allclose(np.asarray(y), 0.0)

    g = jax.grad(lambda p: jnp.mean(model.apply(p, x, t) ** 2) +
                 jnp.mean(model.apply(p, x, t)))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_simple_diffusion_model():
    model = SimpleDiffusionModel(d_model=32, num_layers=2)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 8, 2))
    t = jax.random.uniform(key, (2, 1))
    params = model.init(key, x, t)
    assert model.apply(params, x, t).shape == x.shape


def test_alpha_bar_schedule():
    assert float(alpha_bar(jnp.float32(0.0))) > 0.999
    assert float(alpha_bar(jnp.float32(1.0))) < 1e-3
    t = jnp.linspace(0, 1, 11)
    a = np.asarray(alpha_bar(t))
    assert np.all(np.diff(a) < 0)  # monotone decreasing


def test_ddpm_corrupt_statistics():
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((8, 16, 16, 2))
    xt, eps = ddpm_corrupt(key, x0, jnp.zeros((8,)))
    # at t=0 almost no noise
    np.testing.assert_allclose(np.asarray(xt), np.asarray(x0), atol=0.05)
    xt, eps = ddpm_corrupt(key, x0, jnp.ones((8,)))
    # at t=1 pure noise: mean ~ 0
    assert abs(float(xt.mean())) < 0.1


def test_ddpm_sample_perfect_model_recovers_signal():
    """If the model predicts the true eps for x0=0.7, sampling converges
    near 0.7."""
    target = 0.7

    def eps_fn(x, t):
        a = alpha_bar(t.reshape(-1, 1, 1, 1))
        # x = x0*sqrt(a)+eps*sqrt(1-a) -> eps = (x - x0 sqrt(a))/sqrt(1-a)
        return (x - target * jnp.sqrt(a)) / jnp.sqrt(1 - a + 1e-8)

    trace = ddpm_sample(
        jax.random.PRNGKey(0), eps_fn, (2, 4, 4, 2), timesteps=50,
        trace_steps=5,
    )
    assert trace.shape == (5, 2, 4, 4, 2)
    final = np.asarray(trace[-1])
    np.testing.assert_allclose(final, target, atol=0.1)
