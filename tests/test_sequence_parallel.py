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
