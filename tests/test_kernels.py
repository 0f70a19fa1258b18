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


def test_vq_train_stats_kernel_matches_xla(rng):
    """Fused search+stats kernel vs the vq_apply internals: indices,
    quantized, per-code counts, error sums, raw dw — ragged N included."""
    from world_modelz_tpu.kernels.vq_kernels import vq_train_stats_pallas

    K, D, N = 24, 16, 75  # ragged vs tile_n=32
    state = _vq_state(rng, K=K, D=D)
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))

    idx, q, cnt, err, dw = vq_train_stats_pallas(
        x, state.codebook[0], tile_n=32, interpret=True
    )

    idx_ref = vq_encode(state, x[:, None, :]).reshape(-1)
    q_ref = vq_decode(state, idx_ref[:, None]).reshape(N, D)
    onehot = jax.nn.one_hot(idx_ref, K)
    cnt_ref = jnp.sum(onehot, axis=0)
    sq = jnp.sum((q_ref - x) ** 2, axis=-1)
    err_ref = jnp.einsum("n,nk->k", sq, onehot)
    dw_ref = jnp.einsum("nk,nd->kd", onehot, x)

    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_ref))
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(cnt), np.asarray(cnt_ref), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(err), np.asarray(err_ref), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(dw), np.asarray(dw_ref), rtol=1e-5, atol=1e-5
    )


def test_tokenizer_pallas_vq_backend_matches_xla(rng):
    """VQAutoEncoder with vq_backend='pallas' (fused encode + train kernels,
    interpret mode on CPU) produces identical tokens and matching forward
    results to the XLA backend."""
    import dataclasses

    from world_modelz_tpu.models import VQAutoEncoder

    tok = VQAutoEncoder(
        embedding_dim=8, num_embeddings=16, downscale_steps=1,
        hidden_planes=8, in_channels=1,
    )
    tok_p = dataclasses.replace(tok, vq_backend="pallas")
    x = jnp.asarray(rng.uniform(size=(2, 8, 8, 1)).astype(np.float32))
    state = tok.init(jax.random.PRNGKey(0), x)

    np.testing.assert_array_equal(
        np.asarray(tok.encode(state, x)), np.asarray(tok_p.encode(state, x))
    )

    recon, out, new_state = tok.forward(state, x, train=True)
    recon_p, out_p, new_state_p = tok_p.forward(state, x, train=True)
    np.testing.assert_allclose(
        np.asarray(recon), np.asarray(recon_p), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(out.commitment_loss), float(out_p.commitment_loss), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state.vq.codebook),
        np.asarray(new_state_p.vq.codebook),
        rtol=1e-5,
        atol=1e-6,
    )


def test_vq_apply_fused_matches_vq_apply(rng):
    """Full fused training step (state update + losses + gradients) vs
    vq_apply on identical inputs."""
    from world_modelz_tpu.ops.vq import vq_apply, vq_apply_fused

    K, D, N = 24, 16, 75
    state = _vq_state(rng, K=K, D=D)
    x = jnp.asarray(rng.normal(size=(N, 1, D)).astype(np.float32))

    out_ref, st_ref = vq_apply(state, x, train=True)
    out, st = vq_apply_fused(state, x, train=True, interpret=True)

    np.testing.assert_array_equal(
        np.asarray(out.indices), np.asarray(out_ref.indices)
    )
    np.testing.assert_allclose(
        np.asarray(out.quantized), np.asarray(out_ref.quantized), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(out.commitment_loss), float(out_ref.commitment_loss), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(out.perplexity), float(out_ref.perplexity), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(st), jax.tree_util.tree_leaves(st_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )

    # gradients through the straight-through path match
    def loss(fn, x):
        out, _ = fn(state, x, train=True)
        return jnp.sum(out.quantized**2) + out.commitment_loss

    g_ref = jax.grad(lambda x: loss(vq_apply, x))(x)
    g = jax.grad(
        lambda x: loss(
            lambda s, x, train: vq_apply_fused(s, x, train=train, interpret=True),
            x,
        )
    )(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5)


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
    """Grids past the full-frame VMEM budget H-tile; grids with no valid
    tile raise (explicit pallas) or fall back to XLA (auto)."""
    import pytest

    from world_modelz_tpu.kernels.local3d import (
        fits_vmem,
        kernel_supported,
        pick_h_tile,
    )
    from world_modelz_tpu.models.attention import Local3dAttentionTransformer

    assert fits_vmem(32, 16, 16, (3, 1, 1), 128)
    # 32x32 (Sber scale): full-frame no, H-tiled yes
    assert not fits_vmem(32, 32, 32, (3, 1, 1), 128)
    assert pick_h_tile(32, 32, 32, (3, 1, 1), 128) is not None
    assert kernel_supported(32, 32, 32, (3, 1, 1), 128)
    # spatial extent wider than any valid tile: unsupported
    assert pick_h_tile(32, 32, 32, (3, 20, 1), 128) is None
    assert not kernel_supported(32, 32, 32, (3, 20, 1), 128)

    kw = dict(
        data_shape=(2, 32, 32), dim=16, num_classes=8, extents=(3, 20, 1),
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


def test_local3d_tiled_kernel_matches_xla(rng):
    """H-tiled path golden test: force tiling by calling the tiled impl
    directly at a small scale, plus the auto-dispatch at 32x32."""
    from world_modelz_tpu.kernels.local3d import _fwd_impl_tiled

    extents, heads = (2, 1, 1), 2
    b, s, h, w, inner = 1, 5, 8, 4, 8
    q = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    ref = local3d_attention(q, k, v, extents, heads)
    out = _fwd_impl_tiled(q, k, v, extents, heads, True, 4)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


def test_local3d_tiled_kernel_gradients_match_xla(rng):
    from world_modelz_tpu.kernels.local3d import (
        _bwd_impl_tiled,
        _fwd_impl_tiled,
    )

    extents, heads = (1, 1, 0), 2
    b, s, h, w, inner = 2, 3, 8, 4, 8
    q = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))

    def loss_ref(q, k, v):
        out = local3d_attention(q, k, v, extents, heads)
        return jnp.sum(out**2) + jnp.sum(out)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    out = _fwd_impl_tiled(q, k, v, extents, heads, True, 4)
    g = 2.0 * out + 1.0  # d(loss)/d(out)
    g_pal = _bwd_impl_tiled(q, k, v, g, extents, heads, True, 4)
    for a, b_ in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5
        )


def test_local3d_dispatch_tiles_large_grids(rng):
    """32x32 grid now routes through the tiled kernel via the public entry
    (value + grad), matching XLA."""
    extents, heads = (1, 1, 1), 1
    b, s, h, w, inner = 1, 2, 32, 32, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))

    from world_modelz_tpu.kernels.local3d import fits_vmem

    # make sure this size genuinely exercises the tiled path
    assert not fits_vmem(s, h, w, extents, inner // heads)

    ref = local3d_attention(q, k, v, extents, heads)
    out = local3d_attention_pallas(q, k, v, extents, heads, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )

    def loss_ref(q, k, v):
        return jnp.sum(local3d_attention(q, k, v, extents, heads) ** 2)

    def loss_pal(q, k, v):
        return jnp.sum(
            local3d_attention_pallas(q, k, v, extents, heads, True) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5
        )


def test_local3d_kernel_bf16_path(rng):
    """bf16 q/k/v run the MXU-native low-precision path (operands stay
    bf16, f32 accumulation); values and gradients must track the f32 XLA
    reference within bf16 tolerance."""
    extents, heads = (1, 1, 1), 2
    b, s, h, w, inner = 2, 3, 4, 4, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, w, inner)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(b, s, h, w, inner)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(b, s, h, w, inner)), jnp.bfloat16)

    ref = local3d_attention(
        q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32), extents, heads,
    )
    out = local3d_attention_pallas(q, k, v, extents, heads, True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref), rtol=0.05, atol=0.05
    )

    def loss_pal(q, k, v):
        return jnp.sum(
            local3d_attention_pallas(q, k, v, extents, heads, True)
            .astype(jnp.float32) ** 2
        )

    def loss_ref(q, k, v):
        return jnp.sum(local3d_attention(q, k, v, extents, heads) ** 2)

    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_),
            rtol=0.1, atol=0.25,
        )


def test_local3d_per_frame_impls_still_match(rng):
    """The per-frame fwd/bwd kernels (used when the all-frames working set
    exceeds VMEM) keep golden parity — exercised directly since small test
    shapes now route to the all-frames variant."""
    from world_modelz_tpu.kernels.local3d import _bwd_impl, _fwd_impl

    extents, heads = (1, 1, 1), 2
    b, s, h, w, inner = 2, 4, 4, 4, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))

    ref = local3d_attention(q, k, v, extents, heads)
    out = _fwd_impl(q, k, v, extents, heads, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )

    g = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))
    dq, dk, dv = _bwd_impl(q, k, v, g, extents, heads, True)

    def loss(q, k, v):
        return jnp.sum(local3d_attention(q, k, v, extents, heads) * g)

    rq, rk, rv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in ((dq, rq), (dk, rk), (dv, rv)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4
        )


def test_allframes_route_selection():
    """Route checks: unbanded budgets unchanged (m3 shape -> all-frames
    fwd but not bwd; 32-frame volume fits neither), and the banded picker
    unlocks what full frames cannot fit."""
    from world_modelz_tpu.kernels.local3d import (
        fits_vmem_allframes,
        fits_vmem_allframes_bwd,
        pick_allframes_band,
    )

    assert fits_vmem_allframes(6, 16, 16, (3, 1, 1), 128)
    assert not fits_vmem_allframes_bwd(6, 16, 16, (3, 1, 1), 128)
    assert not fits_vmem_allframes(32, 16, 16, (3, 1, 1), 128)
    # banding: the flagship bwd now fits all-frames (bf16 at qt=8)
    assert pick_allframes_band(6, 16, 16, (3, 1, 1), 128, 2, bwd=True) == 8
    # the 32-frame bf16 volume passes the analytic fits model at qt=4 but
    # its 128-tile static unroll measured 29.7 MB of Mosaic scoped VMEM on
    # v5e (compile-time OOM) — the tile cap must route it elsewhere
    assert pick_allframes_band(32, 16, 16, (3, 1, 1), 128, 2) is None
    assert pick_allframes_band(6, 16, 16, (3, 1, 1), 128, 2) == 4
    # a grid too large even banded falls through to the tiled/per-frame path
    assert pick_allframes_band(32, 64, 64, (3, 1, 1), 128, 2) is None


def test_per_frame_banded_fwd_bwd_parity(rng):
    """Banded per-frame-grid kernels match the XLA golden (clamped edge
    bands + banded dK/dV slab accumulation)."""
    from world_modelz_tpu.kernels.local3d import _bwd_impl, _fwd_impl

    extents, heads = (2, 1, 1), 2
    b, s, h, w, inner = 2, 3, 8, 4, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))

    ref = local3d_attention(q, k, v, extents, heads)
    _, vjp = jax.vjp(
        lambda q, k, v: local3d_attention(q, k, v, extents, heads), q, k, v
    )
    grads_ref = vjp(g)
    for qt in (None, 4, 2):
        out = _fwd_impl(q, k, v, extents, heads, True, qt)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
        )
        grads = _bwd_impl(q, k, v, g, extents, heads, True, qt)
        for a, b_ in zip(grads, grads_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5
            )


def test_allframes_banded_fwd_bwd_parity(rng):
    """Banded all-frames kernels (every qt) match the XLA golden, including
    clamped edge bands and the static-concat dK/dV accumulation."""
    from world_modelz_tpu.kernels.local3d import (
        _bwd_impl_allframes,
        _fwd_impl_allframes,
    )

    extents, heads = (2, 1, 1), 2
    b, s, h, w, inner = 2, 3, 8, 4, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))

    ref = local3d_attention(q, k, v, extents, heads)
    _, vjp = jax.vjp(
        lambda q, k, v: local3d_attention(q, k, v, extents, heads), q, k, v
    )
    grads_ref = vjp(g)
    for qt in (None, 8, 4, 2):
        out = _fwd_impl_allframes(q, k, v, extents, heads, True, qt)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
        )
        grads = _bwd_impl_allframes(q, k, v, g, extents, heads, True, qt)
        for a, b_ in zip(grads, grads_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5
            )


def test_allframes_colband_fwd_bwd_parity(rng):
    """Dual-axis (qt x wt) all-frames tiles match the XLA golden,
    including clamped edge column bands and the overlapping
    `_band_add_ax2` dK/dV accumulation (kernels/local3d.py
    pick_allframes_wt path — column tiles overlap by 2*ew)."""
    from world_modelz_tpu.kernels.local3d import (
        _bwd_impl_allframes,
        _fwd_impl_allframes,
    )

    extents, heads = (2, 1, 1), 2
    b, s, h, w, inner = 2, 3, 8, 8, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    g = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))

    ref = local3d_attention(q, k, v, extents, heads)
    _, vjp = jax.vjp(
        lambda q, k, v: local3d_attention(q, k, v, extents, heads), q, k, v
    )
    grads_ref = vjp(g)
    for qt, wt in ((4, 4), (8, 2), (4, 2), (2, 8), (8, 4)):
        out = _fwd_impl_allframes(q, k, v, extents, heads, True, qt, wt)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5,
            err_msg=f"fwd qt={qt} wt={wt}",
        )
        grads = _bwd_impl_allframes(
            q, k, v, g, extents, heads, True, qt, wt
        )
        for a, b_ in zip(grads, grads_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5,
                err_msg=f"bwd qt={qt} wt={wt}",
            )


# ---------------------------------------------------------------------------
# Fused whole-block kernel (local3d_block)
# ---------------------------------------------------------------------------


def _block_operands(rng, b=2, s=4, h=4, w=4, dim=24, heads=2, dh=8,
                    dtype=np.float32):
    inner = heads * dh
    f = lambda *shape: jnp.asarray(rng.normal(size=shape).astype(dtype))
    x_kv = f(b, s, h, w, dim)
    q_in = f(b, s, h, w, dim)
    wk, wv, wq = f(dim, inner), f(dim, inner), f(dim, inner)
    bv = f(inner)
    wo, bo = f(inner, dim), f(dim)
    return x_kv, q_in, wk, wv, bv, wq, wo, bo


def test_local3d_block_matches_composition(rng):
    from world_modelz_tpu.kernels.local3d_block import (
        _block_reference,
        local3d_block,
    )

    extents, heads = (1, 1, 1), 2
    ops = _block_operands(rng, heads=heads)
    ref = _block_reference(*ops, extents, heads)
    out = local3d_block(*ops, extents, heads, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_local3d_block_banded_matches_composition(rng):
    """Fused block at a 16x16 grid, where the attention section runs
    banded (qt=8 by `_band_candidates`): parity vs the XLA composition."""
    from world_modelz_tpu.kernels.local3d_block import (
        _block_reference,
        local3d_block,
    )

    extents, heads = (1, 1, 1), 1
    ops = _block_operands(rng, b=1, s=3, h=16, w=16, dim=16, heads=1, dh=16)
    ref = _block_reference(*ops, extents, heads)
    out = local3d_block(*ops, extents, heads, True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-4
    )


def test_local3d_block_gradients_match_composition(rng):
    from world_modelz_tpu.kernels.local3d_block import (
        _block_reference,
        local3d_block,
    )

    extents, heads = (2, 1, 1), 1
    ops = _block_operands(rng, s=5, heads=1, dh=16)
    # cotangent fixed (loss linear in out) so the comparison isolates the
    # vjp math from fwd-output rounding differences
    cot = jnp.asarray(
        rng.normal(size=(2, 5, 4, 4, 24)).astype(np.float32)
    )

    def loss_ref(*ops):
        return jnp.sum(_block_reference(*ops, extents, heads) * cot)

    def loss_fused(*ops):
        return jnp.sum(local3d_block(*ops, extents, heads, True) * cot)

    g_ref = jax.grad(loss_ref, argnums=tuple(range(8)))(*ops)
    g_fus = jax.grad(loss_fused, argnums=tuple(range(8)))(*ops)
    for a, b_ in zip(g_fus, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-4
        )


def test_local3d_module_fused_backend_matches_xla(rng):
    """The full Local3dAttention module produces the same values and
    parameter gradients under backend='fused' (interpret) and 'xla'."""
    from world_modelz_tpu.models.attention import Local3dAttention

    extents, heads, dim_head, dim = (1, 1, 1), 1, 12, 20
    b, s, h, w = 2, 3, 4, 4
    x = jnp.asarray(rng.normal(size=(b, s, h, w, dim)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(b, s, h, w, dim)).astype(np.float32))

    kw = dict(extents=extents, heads=heads, dim_head=dim_head)
    m_x = Local3dAttention(backend="xla", **kw)
    m_f = Local3dAttention(backend="fused", **kw)
    params = m_x.init(jax.random.PRNGKey(0), x, q)["params"]

    out_x = m_x.apply({"params": params}, x, q)
    out_f = m_f.apply({"params": params}, x, q)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_x), rtol=2e-4, atol=2e-4
    )

    def loss(mod, p):
        return jnp.sum(mod.apply({"params": p}, x, q) ** 2)

    g_x = jax.grad(lambda p: loss(m_x, p))(params)
    g_f = jax.grad(lambda p: loss(m_f, p))(params)
    flat_x = jax.tree_util.tree_leaves_with_path(g_x)
    flat_f = jax.tree_util.tree_leaves_with_path(g_f)
    for (px, ax), (pf, af) in zip(flat_x, flat_f):
        assert px == pf
        np.testing.assert_allclose(
            np.asarray(af), np.asarray(ax), rtol=1e-3, atol=1e-4,
            err_msg=str(px),
        )


def test_local3d_module_param_tree_unchanged(rng):
    """Raw-param declaration keeps nn.Dense's exact tree (checkpoint
    compatibility) for every backend."""
    from world_modelz_tpu.models.attention import Local3dAttention

    x = jnp.zeros((1, 2, 4, 4, 20))
    m = Local3dAttention(extents=(1, 1, 1), heads=2, dim_head=8)
    params = m.init(jax.random.PRNGKey(0), x, x)["params"]
    assert set(params) == {"to_k", "to_v", "to_q", "to_out"}
    assert set(params["to_k"]) == {"kernel"}
    assert set(params["to_v"]) == {"kernel", "bias"}
    assert set(params["to_q"]) == {"kernel"}
    assert set(params["to_out"]) == {"kernel", "bias"}
    assert params["to_k"]["kernel"].shape == (20, 16)
    assert params["to_out"]["kernel"].shape == (16, 20)


def test_block_supported_gating():
    from world_modelz_tpu.kernels.local3d_block import block_supported

    # flagship m3 shape in bf16 must be fused-eligible
    assert block_supported(6, 16, 16, (3, 1, 1), 1, 128, 384, 384, 2)
    # minecraft/sber 32x32 grid blows the clip working set
    assert not block_supported(16, 32, 32, (3, 1, 1), 1, 128, 384, 384, 2)


def test_local3d_tiled_banded_bwd_edge_band(rng):
    """Banded H-tiled backward at band == 2*TH (eh == TH/2): the 2eh-row
    band tail fills its whole TH-row fold buffer — the overlap edge case
    of the banded partial format."""
    from world_modelz_tpu.kernels.local3d import (
        _bwd_impl_tiled,
        _fwd_impl_tiled,
    )

    extents, heads = (1, 2, 1), 1
    b, s, h, w, inner = 1, 3, 12, 4, 8
    q = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))

    def loss_ref(q, k, v):
        out = local3d_attention(q, k, v, extents, heads)
        return jnp.sum(out**2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    out = _fwd_impl_tiled(q, k, v, extents, heads, True, 4)
    g_pal = _bwd_impl_tiled(q, k, v, 2.0 * out, extents, heads, True, 4)
    for a, b_ in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5
        )


def test_split_bwd_route_selection():
    """Backward routing chain (all-frames -> per-frame -> split ->
    H-tiled): at the Sber 32x32 bf16 shape the first two pickers decline
    and the split backward takes the route — the shape where it measured
    695 vs 1107 us for the H-tiled fallback (benchmarks/band_ab.py)."""
    from world_modelz_tpu.kernels.local3d import (
        kernel_supported,
        pick_allframes_band,
        pick_frame_band,
        pick_split_bands,
    )

    assert pick_allframes_band(16, 32, 32, (3, 1, 1), 128, 2, bwd=True) is None
    assert pick_frame_band(16, 32, 32, (3, 1, 1), 128, True, 2) is None
    # narrow-first for both bands (kt=4 measured ahead of kt=8)
    assert pick_split_bands(16, 32, 32, (3, 1, 1), 128, 2) == (4, 4)
    assert kernel_supported(16, 32, 32, (3, 1, 1), 128)
    # shapes the per-frame grid still fits keep it (s32 measured
    # per-frame 247 vs split 283 us)
    assert pick_frame_band(32, 16, 16, (3, 1, 1), 128, True, 2) is not None


def test_split_bwd_routed_parity(rng, monkeypatch):
    """Force the split branch of `_route_bwd` (decline the all-frames and
    per-frame pickers) and check gradients through the public custom-VJP
    entry point match XLA."""
    from world_modelz_tpu.kernels import local3d

    monkeypatch.setattr(
        local3d, "pick_allframes_band", lambda *a, **k: None
    )
    monkeypatch.setattr(local3d, "pick_frame_band", lambda *a, **k: None)

    extents, heads = (2, 1, 1), 2
    b, s, h, w, inner = 1, 4, 8, 4, 16
    q = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))

    def loss_pal(q, k, v):
        return jnp.sum(local3d_attention_pallas(q, k, v, extents, heads, True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(local3d_attention(q, k, v, extents, heads) ** 2)

    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_pal, g_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5
        )


def test_local3d_split_bwd_matches_xla(rng):
    """Split (flash-style) backward golden test: dQ pass + key-centric
    dK/dV pass reconstruct exact gradients from the saved lse/delta —
    banded and unbanded, asymmetric extents, multihead."""
    from world_modelz_tpu.kernels.local3d import _bwd_impl_split

    for extents, heads, b, s, h, w, inner, qt, kt in [
        ((1, 1, 1), 1, 1, 3, 3, 3, 8, None, None),
        ((2, 1, 0), 2, 2, 5, 3, 4, 8, None, None),
        ((3, 1, 1), 1, 1, 4, 8, 8, 16, 4, 2),
    ]:
        q = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))

        def loss_ref(q, k, v):
            out = local3d_attention(q, k, v, extents, heads)
            return jnp.sum(out**2) + jnp.sum(out)

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        out = local3d_attention(q, k, v, extents, heads)
        g_split = _bwd_impl_split(
            q, k, v, 2.0 * out + 1.0, extents, heads, True, qt, kt
        )
        for a, b_ in zip(g_split, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=5e-4, atol=5e-5
            )


def test_local3d_split_bwd_bf16(rng):
    """bf16 split backward tracks the f32 XLA reference within bf16
    gradient tolerance (operands and stored stats stay low-precision on
    the hot path; lse/delta are always f32)."""
    from world_modelz_tpu.kernels.local3d import _bwd_impl_split

    extents, heads = (1, 1, 1), 2
    b, s, h, w, inner = 2, 3, 4, 4, 16
    q32 = rng.normal(size=(b, s, h, w, inner)).astype(np.float32)
    k32 = rng.normal(size=(b, s, h, w, inner)).astype(np.float32)
    v32 = rng.normal(size=(b, s, h, w, inner)).astype(np.float32)

    def loss_ref(q, k, v):
        return jnp.sum(local3d_attention(q, k, v, extents, heads) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(q32), jnp.asarray(k32), jnp.asarray(v32)
    )
    out = local3d_attention(
        jnp.asarray(q32), jnp.asarray(k32), jnp.asarray(v32), extents, heads
    )
    g_split = _bwd_impl_split(
        jnp.asarray(q32, jnp.bfloat16),
        jnp.asarray(k32, jnp.bfloat16),
        jnp.asarray(v32, jnp.bfloat16),
        (2.0 * out).astype(jnp.bfloat16),
        extents, heads, True,
    )
    for a, b_ in zip(g_split, g_ref):
        assert a.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b_), rtol=0.1, atol=0.25
        )


def test_allframes_outlier_masked_key_no_nan(rng):
    """Underflow-safety regression (advisor round 4): the fused exp*mask
    softmax must take its max over VALID keys only. With qt covering the
    whole height, rows outside a query's +/-eh window are loaded-but-masked;
    if such a key's raw score exceeds every valid score by >~88 (f32 exp
    range), a raw-score max underflows all valid probabilities to 0 and the
    normalizer becomes 0 -> 0/0 NaN. Forward AND backward."""
    from world_modelz_tpu.kernels.local3d import (
        _bwd_impl_allframes,
        _fwd_impl_allframes,
    )

    extents, heads = (1, 1, 1), 1
    b, s, h, w, inner = 1, 3, 4, 4, 16
    q = rng.normal(size=(b, s, h, w, inner)).astype(np.float32)
    k = rng.normal(size=(b, s, h, w, inner)).astype(np.float32)
    v = rng.normal(size=(b, s, h, w, inner)).astype(np.float32)
    # queries at row 0 of frame 0 attend only to rows 0..1; row h-1 is
    # inside the loaded band (qt=h) but masked. Give it a score ~400 above
    # the valid max for those queries.
    q[0, 0, 0] = 10.0
    k[0, 0, h - 1] = 10.0
    q, k, v = jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)

    ref = local3d_attention(q, k, v, extents, heads)
    out = _fwd_impl_allframes(q, k, v, extents, heads, True, qt=h)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )

    def loss(q, k, v):
        return jnp.sum(local3d_attention(q, k, v, extents, heads) ** 2)

    g_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    grads = _bwd_impl_allframes(
        q, k, v, 2.0 * ref, extents, heads, True, qt=h
    )
    for a, b_ in zip(grads, g_ref):
        assert np.isfinite(np.asarray(a)).all()
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-3, atol=2e-4
        )
