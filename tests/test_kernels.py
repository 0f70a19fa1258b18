"""Golden tests: Pallas kernels vs their XLA reference implementations
(interpret mode on CPU), following the reference's Triton-vs-eager harness
idiom (local_3d_attention_triton1.py:276-319)."""

import jax
import jax.numpy as jnp
import numpy as np

from world_modelz_tpu.kernels.local3d import local3d_attention_pallas
from world_modelz_tpu.kernels.vq_kernels import vq_encode_pallas
from world_modelz_tpu.models.attention import local3d_attention
from world_modelz_tpu.ops.vq import VQState, vq_decode, vq_encode


def _vq_state(rng, K=32, D=16):
    codebook = rng.normal(size=(1, K, D)).astype(np.float32)
    return VQState(
        codebook=jnp.asarray(codebook),
        cluster_size=jnp.ones((1, K)),
        activation_count=jnp.zeros((1, K)),
        accumulated_error=jnp.zeros((1, K)),
    )


def test_vq_kernel_matches_xla(rng):
    state = _vq_state(rng)
    x = jnp.asarray(rng.normal(size=(100, 16)).astype(np.float32))

    idx_ref = vq_encode(state, x[:, None, :]).reshape(-1)
    q_ref = vq_decode(state, idx_ref[:, None]).reshape(100, 16)

    idx, q = vq_encode_pallas(
        x, state.codebook[0], tile_n=32, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref), rtol=1e-5)


def test_vq_kernel_ragged_n(rng):
    """N not divisible by tile_n (padding path)."""
    state = _vq_state(rng, K=16, D=8)
    x = jnp.asarray(rng.normal(size=(37, 8)).astype(np.float32))
    idx, q = vq_encode_pallas(x, state.codebook[0], tile_n=16, interpret=True)
    idx_ref = vq_encode(state, x[:, None, :]).reshape(-1)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    assert q.shape == (37, 8)


def test_local3d_kernel_matches_xla(rng):
    extents, heads = (1, 1, 1), 2
    b, s, h, w, inner = 2, 4, 4, 4, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))

    ref = local3d_attention(q, k, v, extents, heads)
    out = local3d_attention_pallas(q, k, v, extents, heads, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


def test_local3d_kernel_asymmetric_extents(rng):
    extents, heads = (2, 1, 0), 1
    b, s, h, w, inner = 1, 5, 3, 4, 8
    q = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    ref = local3d_attention(q, k, v, extents, heads)
    out = local3d_attention_pallas(q, k, v, extents, heads, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


def test_local3d_kernel_gradients_multihead_asymmetric(rng):
    extents, heads = (2, 1, 0), 2
    b, s, h, w, inner = 2, 5, 3, 4, 8
    q = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))

    def loss_ref(q, k, v):
        out = local3d_attention(q, k, v, extents, heads)
        return jnp.sum(out**2) + jnp.sum(out)

    def loss_pallas(q, k, v):
        out = local3d_attention_pallas(q, k, v, extents, heads, True)
        return jnp.sum(out**2) + jnp.sum(out)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5
        )


def test_local3d_kernel_gradients_match_xla(rng):
    extents, heads = (1, 1, 1), 1
    b, s, h, w, inner = 1, 3, 3, 3, 8
    q = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))

    def loss_ref(q, k, v):
        return jnp.sum(local3d_attention(q, k, v, extents, heads) ** 2)

    def loss_pallas(q, k, v):
        return jnp.sum(
            local3d_attention_pallas(q, k, v, extents, heads, True) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5
        )


def test_vmem_guard_and_auto_fallback():
    """Oversized grids: explicit pallas raises; auto falls back to XLA."""
    import pytest

    from world_modelz_tpu.kernels.local3d import fits_vmem
    from world_modelz_tpu.models.attention import Local3dAttentionTransformer

    assert fits_vmem(32, 16, 16, (3, 1, 1), 128)
    assert not fits_vmem(32, 32, 32, (3, 1, 1), 128)

    kw = dict(
        data_shape=(2, 32, 32), dim=16, num_classes=8, extents=(3, 1, 1),
        depth=1, heads=1, dim_head=128, mlp_dim=16,
    )
    tokens = jnp.zeros((1, 2, 32, 32), jnp.int32)
    key = jax.random.PRNGKey(0)

    with pytest.raises(ValueError, match="exceeds VMEM"):
        Local3dAttentionTransformer(**kw, backend="pallas").init(key, tokens)

    # auto: silently uses XLA, still works
    m = Local3dAttentionTransformer(**kw, backend="auto")
    p = m.init(key, tokens)
    out = m.apply(p, tokens)
    assert out.shape == (1, 2, 32, 32, 16)
