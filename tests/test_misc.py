"""Tests for gMLP, patchify helpers, named schedules, external tokenizer
bridge, and the ddpm/masked glue not covered elsewhere."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from world_modelz_tpu.cli.masked_denoise import patchify, unpatchify
from world_modelz_tpu.diffusion.schedules import named_schedule
from world_modelz_tpu.models.gmlp import GMLP, SpatialGatingUnit
from world_modelz_tpu.ops.vq import vq_decode_masked, vq_init


def test_patchify_roundtrip(rng):
    x = jnp.asarray(rng.uniform(size=(2, 16, 16, 3)).astype(np.float32))
    p = patchify(x, 4)
    assert p.shape == (2, 16, 48)
    back = unpatchify(p, 4, 4)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_named_schedules():
    r = jnp.linspace(0, 1, 11)
    for name in ("linear", "cos1", "cos2", "cos05", "cos3", "cos2_inv",
                 "cos3_inv"):
        out = np.asarray(named_schedule(name)(r))
        assert out.shape == r.shape
        assert np.all(np.isfinite(out))
    np.testing.assert_allclose(
        np.asarray(named_schedule("linear")(r)), np.asarray(r)
    )
    # cos-family: decreasing in r; inv variants increasing
    c = np.asarray(named_schedule("cos2")(r))
    assert np.all(np.diff(c) <= 1e-6)
    ci = np.asarray(named_schedule("cos2_inv")(r))
    assert np.all(np.diff(ci) >= -1e-6)
    with pytest.raises(ValueError, match="unknown schedule"):
        named_schedule("bogus")


def test_spatial_gating_unit_near_identity_at_init():
    """SGU init (tiny token-mix weights, unit bias) ~= gate-norm passthrough
    (gmlp.py:81-83 rationale)."""
    sgu = SpatialGatingUnit(seq_len=8)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 8, 16))
    params = sgu.init(key, x)
    out = sgu.apply(params, x)
    res, gate = np.split(np.asarray(x), 2, axis=-1)
    # gate ~ LayerNorm(gate) * ~0 + 1  ->  out ~ res
    np.testing.assert_allclose(np.asarray(out), res, atol=0.05)


def test_gmlp_shapes_and_vq_projection():
    model = GMLP(
        num_tokens_in=17, num_tokens_out=16, dim=32, depth=2, seq_len=8,
        vq_embedding_dim=12, attn_dim=8,
    )
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (2, 8), 0, 17)
    emb = jax.random.normal(key, (2, 8, 12))
    params = model.init(key, tokens, emb)
    logits = model.apply(params, tokens, emb)
    assert logits.shape == (2, 8, 16)


def test_gmlp_layer_drop_rng():
    model = GMLP(
        num_tokens_in=8, num_tokens_out=8, dim=16, depth=3, seq_len=4,
        prob_survival=0.5,
    )
    key = jax.random.PRNGKey(0)
    tokens = jnp.zeros((1, 4), jnp.int32)
    params = model.init(key, tokens)
    out1 = model.apply(
        params, tokens, train=True, rngs={"layer_drop": jax.random.PRNGKey(1)}
    )
    out2 = model.apply(
        params, tokens, train=True, rngs={"layer_drop": jax.random.PRNGKey(2)}
    )
    assert not np.allclose(np.asarray(out1), np.asarray(out2))
    # eval mode: deterministic, no rng needed
    e1 = model.apply(params, tokens)
    e2 = model.apply(params, tokens)
    np.testing.assert_array_equal(np.asarray(e1), np.asarray(e2))


def test_vq_decode_masked_zeros():
    state = vq_init(
        jax.random.PRNGKey(0), num_latents=1, num_embeddings=8,
        embedding_dim=4,
    )
    idx = jnp.asarray([[0], [8], [3]])  # 8 == mask token
    out = np.asarray(vq_decode_masked(state, idx, mask_token=8))
    np.testing.assert_array_equal(out[1], np.zeros((1, 4)))
    assert np.abs(out[0]).sum() > 0


def test_native_tokenizer_bridge():
    import jax

    from world_modelz_tpu.models import VQAutoEncoder
    from world_modelz_tpu.models.external import (
        FrameTokenizer,
        NativeTokenizer,
    )

    tok = VQAutoEncoder(
        embedding_dim=8, num_embeddings=32, downscale_steps=2,
        hidden_planes=16,
    )
    key = jax.random.PRNGKey(0)
    state = tok.init(key, jnp.zeros((1, 16, 16, 3)))
    bridge = NativeTokenizer(tok, state)
    assert isinstance(bridge, FrameTokenizer)

    imgs = np.random.default_rng(0).uniform(0, 1, (2, 16, 16, 3)).astype(
        np.float32
    )
    z = bridge.encode(imgs)
    assert z.shape == (2, 4, 4) and z.dtype == np.int32
    back = bridge.decode(z)
    assert back.shape == (2, 16, 16, 3)


def test_make_tokenizer_bad_spec():
    from world_modelz_tpu.models.external import make_tokenizer

    with pytest.raises(ValueError, match="unknown tokenizer spec"):
        make_tokenizer("bogus:path")
