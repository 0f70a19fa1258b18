"""Golden tests for the attention backbones.

The windowed space-time attention core is checked against a brute-force
per-query numpy loop (the semantics of the reference's pad+unfold
implementation, local_3d_attention.py:78-99).
"""

import jax
import jax.numpy as jnp
import numpy as np

from world_modelz_tpu.models.attention import (
    DenseTransformer,
    Local3dAttentionTransformer,
    local3d_attention,
)
from world_modelz_tpu.models.video import (
    VqSparseDiffusionModel,
    VqVideoDiffusionModel,
)


def bruteforce_local3d(q, k, v, extents, heads):
    """Per-query softmax attention over the in-bounds space-time window."""
    es, eh, ew = extents
    b, s, h, w, inner = q.shape
    dh = inner // heads
    out = np.zeros_like(q)
    scale = dh**-0.5
    for bi in range(b):
        for si in range(s):
            for hi in range(h):
                for wi in range(w):
                    for head in range(heads):
                        sl = slice(head * dh, (head + 1) * dh)
                        qv = q[bi, si, hi, wi, sl]
                        keys, vals = [], []
                        for ds in range(-es, es + 1):
                            for dhh in range(-eh, eh + 1):
                                for dw in range(-ew, ew + 1):
                                    s2, h2, w2 = si + ds, hi + dhh, wi + dw
                                    if 0 <= s2 < s and 0 <= h2 < h and 0 <= w2 < w:
                                        keys.append(k[bi, s2, h2, w2, sl])
                                        vals.append(v[bi, s2, h2, w2, sl])
                        keys = np.stack(keys)
                        vals = np.stack(vals)
                        logits = keys @ qv * scale
                        p = np.exp(logits - logits.max())
                        p /= p.sum()
                        out[bi, si, hi, wi, sl] = p @ vals
    return out


def test_local3d_attention_matches_bruteforce(rng):
    extents, heads = (1, 1, 1), 2
    b, s, h, w, inner = 2, 3, 4, 4, 8
    q = rng.normal(size=(b, s, h, w, inner)).astype(np.float32)
    k = rng.normal(size=(b, s, h, w, inner)).astype(np.float32)
    v = rng.normal(size=(b, s, h, w, inner)).astype(np.float32)
    got = np.asarray(
        local3d_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), extents, heads
        )
    )
    want = bruteforce_local3d(q, k, v, extents, heads)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_local3d_attention_asymmetric_extents(rng):
    extents, heads = (2, 1, 0), 1
    b, s, h, w, inner = 1, 5, 3, 3, 4
    q = rng.normal(size=(b, s, h, w, inner)).astype(np.float32)
    k = rng.normal(size=(b, s, h, w, inner)).astype(np.float32)
    v = rng.normal(size=(b, s, h, w, inner)).astype(np.float32)
    got = np.asarray(
        local3d_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), extents, heads
        )
    )
    want = bruteforce_local3d(q, k, v, extents, heads)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_local3d_transformer_forward_backward():
    """Shape + grad smoke, mirroring the reference's inline test
    (local_3d_attention.py:166-174)."""
    model = Local3dAttentionTransformer(
        data_shape=(10, 8, 8),
        dim=32,
        num_classes=100,
        extents=(2, 2, 2),
        depth=2,
        heads=3,
        dim_head=16,
        mlp_dim=64,
    )
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (2, 4, 8, 8), 0, 99)
    params = model.init(key, tokens)

    def loss(params):
        return jnp.mean(model.apply(params, tokens))

    y = model.apply(params, tokens)
    assert y.shape == (2, 4, 8, 8, 32)
    g = jax.grad(loss)(params)
    total = sum(float(jnp.sum(leaf)) for leaf in jax.tree_util.tree_leaves(g))
    assert np.isfinite(total)


def test_dense_transformer_shapes():
    model = DenseTransformer(depth=2, heads=4, dim_head=8, mlp_dim=64)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 10, 32))
    params = model.init(key, x)
    y = model.apply(params, x)
    assert y.shape == x.shape


def test_dense_attention_flash_backend_gating():
    """backend plumbing: 'flash' needs a TPU (clean error on CPU), 'auto'
    resolves to the XLA einsum path off-TPU with an unchanged param tree,
    and the backend field does not alter parameters (checkpoint compat)."""
    import pytest

    from world_modelz_tpu.models.attention import DenseAttention

    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 1536, 32))  # n >= flash's auto cutoff

    auto = DenseAttention(heads=4, dim_head=8, backend="auto")
    xla = DenseAttention(heads=4, dim_head=8, backend="xla")
    params = auto.init(key, x)
    assert jax.tree_util.tree_structure(
        params
    ) == jax.tree_util.tree_structure(xla.init(key, x))
    np.testing.assert_allclose(
        np.asarray(auto.apply(params, x)),
        np.asarray(xla.apply(params, x)),
        rtol=0,
        atol=0,
    )

    flash = DenseAttention(heads=4, dim_head=8, backend="flash")
    with pytest.raises(ValueError, match="TPU"):
        flash.apply(params, x)

    # attention-weight dropout is incompatible with the streaming softmax
    dropped = DenseAttention(heads=4, dim_head=8, dropout=0.1, backend="flash")
    with pytest.raises(ValueError):
        dropped.apply(
            params, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)}
        )


def test_video_diffusion_model_last_frame_logits():
    model = VqVideoDiffusionModel(
        data_shape=(6, 8, 8),
        dim=32,
        num_classes=64,
        extents=(1, 1, 1),
        depth=1,
        dim_head=32,
        mlp_dim=32,
        heads=1,
    )
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (2, 3, 8, 8), 0, 65)  # incl. mask token
    params = model.init(key, tokens)
    logits = model.apply(params, tokens)
    assert logits.shape == (2, 8, 8, 64)


def test_sparse_diffusion_model():
    model = VqSparseDiffusionModel(
        shape=(8, 4, 4),
        dim=32,
        num_classes=16,
        depth=2,
        dim_head=8,
        mlp_dim=64,
        heads=4,
    )
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (2, 24), 0, 17)
    indices = jax.random.randint(key, (2, 24), 0, 8 * 4 * 4)
    params = model.init(key, tokens, indices)
    logits = model.apply(params, tokens, indices)
    assert logits.shape == (2, 24, 16)


def test_sparse_pos_embedding_consistency():
    """The same volume position must get the same embedding through flat
    indices as decomposed coordinates."""
    model = VqSparseDiffusionModel(
        shape=(4, 3, 5),
        dim=16,
        num_classes=8,
        depth=1,
        dim_head=16,
        mlp_dim=16,
    )
    key = jax.random.PRNGKey(1)
    tokens = jnp.zeros((1, 2), jnp.int32)
    indices = jnp.asarray([[0, 4 * 3 * 5 - 1]])  # first and last cell
    params = model.init(key, tokens, indices)

    emb = model.apply(
        params, jnp.asarray([[17, 17]]), method=lambda m, i: m.pos_embedding_3d(i)
    )
    # index 17 = s=1, h=0, w=2 for (H,W)=(3,5)
    p = params["params"]
    expected = (
        p["pos_emb_s"]["embedding"][1]
        + p["pos_emb_h"]["embedding"][0]
        + p["pos_emb_w"]["embedding"][2]
    )
    np.testing.assert_allclose(np.asarray(emb[0, 0]), np.asarray(expected))
