"""Tests for the conv blocks and the VQ-VAE tokenizer."""

import jax
import jax.numpy as jnp
import numpy as np

from world_modelz_tpu.models import VQAutoEncoder
from world_modelz_tpu.models.conv import upsample_2x


def test_upsample_2x_shape_and_values():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = upsample_2x(x)
    assert y.shape == (1, 4, 4, 1)
    # corners of a half-pixel-centers bilinear resize keep the corner values
    np.testing.assert_allclose(float(y[0, 0, 0, 0]), 0.0)
    np.testing.assert_allclose(float(y[0, 3, 3, 0]), 3.0)


def _make_tokenizer():
    return VQAutoEncoder(
        embedding_dim=8,
        num_embeddings=32,
        downscale_steps=2,
        hidden_planes=16,
        in_channels=3,
    )


def test_tokenizer_shapes():
    tok = _make_tokenizer()
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (2, 16, 16, 3))
    state = tok.init(key, x)

    recon, out, _ = tok.forward(state, x, train=False)
    assert recon.shape == x.shape
    assert out.commitment_loss.shape == ()

    tokens = tok.encode(state, x)
    assert tokens.shape == (2, 4, 4)
    assert tokens.dtype == jnp.int32
    assert int(tokens.max()) < 32

    decoded = tok.decode(state, tokens)
    assert decoded.shape == x.shape


def test_tokenizer_train_updates_codebook_and_bn():
    tok = _make_tokenizer()
    key = jax.random.PRNGKey(1)
    x = jax.random.uniform(key, (2, 16, 16, 3))
    state = tok.init(key, x)

    _, _, new_state = tok.forward(state, x, train=True)
    # VQ codebook moved
    assert not np.allclose(
        np.asarray(new_state.vq.codebook), np.asarray(state.vq.codebook)
    )
    # batch stats moved
    leaves_old = jax.tree_util.tree_leaves(state.batch_stats)
    leaves_new = jax.tree_util.tree_leaves(new_state.batch_stats)
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(leaves_old, leaves_new)
    )


def test_tokenizer_eval_is_pure():
    tok = _make_tokenizer()
    key = jax.random.PRNGKey(2)
    x = jax.random.uniform(key, (2, 16, 16, 3))
    state = tok.init(key, x)
    _, _, new_state = tok.forward(state, x, train=False)
    np.testing.assert_array_equal(
        np.asarray(new_state.vq.codebook), np.asarray(state.vq.codebook)
    )


def test_encode_decode_roundtrip_identity_on_tokens():
    """decode(encode(x)) re-encodes to the same tokens (codebook fixpoint not
    required, but decode->encode of codebook vectors is stable for a frozen
    random model most of the time; we check shape/dtype contract instead)."""
    tok = _make_tokenizer()
    key = jax.random.PRNGKey(3)
    x = jax.random.uniform(key, (1, 32, 32, 3))
    state = tok.init(key, x)
    tokens = tok.encode(state, x)
    assert tokens.shape == (1, 8, 8)
    img = tok.decode(state, tokens)
    assert img.shape == (1, 32, 32, 3)


def test_tokenizer_jit_forward():
    tok = _make_tokenizer()
    key = jax.random.PRNGKey(4)
    x = jax.random.uniform(key, (2, 16, 16, 3))
    state = tok.init(key, x)

    @jax.jit
    def step(state, x):
        recon, out, new_state = tok.forward(state, x, train=True)
        loss = jnp.mean(jnp.abs(recon - x)) + 0.005 * out.commitment_loss
        return loss, new_state

    loss, _ = step(state, x)
    assert np.isfinite(float(loss))


def test_upscale_skip_projection_commutes():
    """The low-resolution skip projection (conv1x1 before upsample,
    models/conv.py) equals the reference order (upsample then conv1x1,
    autoencoder.py:119-138) with identical parameters."""
    from flax import linen as nn

    from world_modelz_tpu.models.conv import UpscaleResidual

    class RefOrder(nn.Module):
        out_planes: int

        @nn.compact
        def __call__(self, x, *, train: bool):
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            h = jax.nn.leaky_relu(h, negative_slope=0.01)
            h = upsample_2x(h)
            x = upsample_2x(x)
            h = nn.Conv(self.out_planes, (3, 3), padding=1, use_bias=True)(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9)(h)
            h = jax.nn.leaky_relu(h, negative_slope=0.01)
            h = nn.Conv(self.out_planes, (3, 3), padding=1, use_bias=True)(h)
            x = nn.Conv(self.out_planes, (1, 1), use_bias=True)(x)
            return h + x

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 4)).astype(np.float32))
    ours = UpscaleResidual(out_planes=8, upsample=True)
    ref = RefOrder(out_planes=8)
    vars_ours = ours.init(jax.random.PRNGKey(0), x, train=False)
    # identical parameter tree structure -> reuse verbatim
    y_ours = ours.apply(vars_ours, x, train=False)
    y_ref = ref.apply(vars_ours, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_ours), np.asarray(y_ref), rtol=1e-5, atol=1e-6
    )


def test_fused_upsample_conv3x3_exact():
    """Polyphase fused upsample+conv equals conv3x3(upsample_2x(x)) —
    interior AND the corrected 1-px border ring — for several shapes,
    including tiny and odd ones."""
    from world_modelz_tpu.models.conv import fused_upsample_conv3x3

    rng = np.random.default_rng(0)
    for (h, w, cin, cout) in [(6, 6, 4, 8), (1, 5, 3, 2), (7, 1, 2, 3),
                              (2, 2, 1, 1), (9, 5, 5, 7)]:
        x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
        k = jnp.asarray(
            rng.normal(size=(3, 3, cin, cout)).astype(np.float32)
        )
        b = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))

        ref = jax.lax.conv_general_dilated(
            upsample_2x(x), k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + b
        out = fused_upsample_conv3x3(x, k, b)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5,
            err_msg=f"shape {(h, w, cin, cout)}",
        )


def test_upscale_residual_fused_matches_unfused():
    """UpscaleResidual(fuse_upsample=True) equals the literal composition
    with identical parameters (same tree: Conv_0/1/2, BatchNorm_0/1)."""
    from world_modelz_tpu.models.conv import UpscaleResidual

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 5, 6, 4)).astype(np.float32))
    fused = UpscaleResidual(out_planes=8, upsample=True, fuse_upsample=True)
    plain = UpscaleResidual(out_planes=8, upsample=True, fuse_upsample=False)
    variables = fused.init(jax.random.PRNGKey(0), x, train=False)
    assert set(variables["params"]) == {
        "Conv_0", "Conv_1", "Conv_2", "BatchNorm_0", "BatchNorm_1",
    }
    y_f = fused.apply(variables, x, train=False)
    y_p = plain.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(y_f), np.asarray(y_p), rtol=1e-4, atol=1e-5
    )


def test_inference_cast_keeps_vq_f32_and_token_agreement():
    """tokenizer_inference_cast (the --tok_bf16 train-path cast) casts only
    the conv stacks to bf16; the VQ codebook stays f32 so nearest-codebook
    assignment matches the f32 rollout/eval path (advisor round 4: a
    whole-state bf16 cast silently flipped borderline VQ assignments
    between train targets and inference tokenization)."""
    from world_modelz_tpu.models.tokenizer import tokenizer_inference_cast

    tok = _make_tokenizer()
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (4, 16, 16, 3))
    state = tok.init(key, x)
    # settle BN/VQ stats a little so assignments aren't degenerate
    for i in range(3):
        _, _, state = tok.forward(
            state, jax.random.uniform(jax.random.PRNGKey(i), x.shape),
            train=True,
        )

    cast = tokenizer_inference_cast(state)
    assert cast.vq.codebook.dtype == jnp.float32
    leaves = jax.tree_util.tree_leaves(cast.params)
    assert all(l.dtype == jnp.bfloat16 for l in leaves
               if jnp.issubdtype(l.dtype, jnp.floating))

    t32 = np.asarray(tok.encode(state, x))
    t16 = np.asarray(tok.encode(cast, x))
    agreement = float((t32 == t16).mean())
    # measured on the round-4 trained tokenizer: 98.9% (residual flips
    # come from the bf16 encoder's latent perturbation, not the VQ);
    # random-init codebooks sit closer together, so allow a margin
    assert agreement >= 0.97, agreement
