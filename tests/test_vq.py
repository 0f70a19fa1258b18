"""Unit tests for the functional EMA vector quantizer.

Checks vq_apply/vq_encode/vq_decode/vq_reuse_inactive against hand-computed
numpy references replicating the semantics of the reference implementation
(vq/vq.py — nearest-code assignment, Laplace-smoothed EMA update,
straight-through gradients, dead-code revival pairing).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from world_modelz_tpu.ops import (
    vq_init,
    vq_apply,
    vq_encode,
    vq_decode,
    vq_reuse_inactive,
    vq_reset_stats,
)
from world_modelz_tpu.ops.vq import vq1_init, vq1_apply, VQState


def _np_distances(codebook, flat_x):
    # (N, L, K) brute-force squared distances
    diff = flat_x[:, :, None, :] - codebook[None, :, :, :]
    return np.sum(diff**2, axis=-1)


def make_state(rng, L=2, K=8, D=4):
    codebook = rng.normal(size=(L, K, D)).astype(np.float32)
    return VQState(
        codebook=jnp.asarray(codebook),
        cluster_size=jnp.ones((L, K), jnp.float32),
        activation_count=jnp.zeros((L, K), jnp.float32),
        accumulated_error=jnp.zeros((L, K), jnp.float32),
    )


def test_encode_matches_bruteforce(rng):
    state = make_state(rng)
    x = rng.normal(size=(16, 2, 4)).astype(np.float32)
    idx = np.asarray(vq_encode(state, jnp.asarray(x)))
    expected = np.argmin(_np_distances(np.asarray(state.codebook), x), axis=-1)
    np.testing.assert_array_equal(idx, expected)


def test_decode_roundtrip(rng):
    state = make_state(rng)
    idx = rng.integers(0, 8, size=(5, 2)).astype(np.int32)
    decoded = np.asarray(vq_decode(state, jnp.asarray(idx)))
    codebook = np.asarray(state.codebook)
    for n in range(5):
        for latent in range(2):
            np.testing.assert_allclose(
                decoded[n, latent], codebook[latent, idx[n, latent]]
            )


def test_quantized_values_and_commitment(rng):
    state = make_state(rng)
    x = rng.normal(size=(16, 2, 4)).astype(np.float32)
    out, _ = vq_apply(state, jnp.asarray(x), train=False)
    codebook = np.asarray(state.codebook)
    idx = np.argmin(_np_distances(codebook, x), axis=-1)
    q = np.stack(
        [codebook[latent, idx[:, latent]] for latent in range(2)], axis=1
    )
    # straight-through output equals the quantized value numerically
    np.testing.assert_allclose(np.asarray(out.quantized), q, rtol=1e-5)
    np.testing.assert_allclose(
        float(out.commitment_loss), np.mean((q - x) ** 2), rtol=1e-5
    )


def test_straight_through_gradient(rng):
    """d/dx of sum(quantized) must be 1 (gradient passes through)."""
    state = make_state(rng)
    x = jnp.asarray(rng.normal(size=(4, 2, 4)).astype(np.float32))

    def f(x):
        out, _ = vq_apply(state, x, train=False)
        return jnp.sum(out.quantized)

    grad = jax.grad(f)(x)
    np.testing.assert_allclose(np.asarray(grad), np.ones_like(x), rtol=1e-6)


def test_ema_update_matches_numpy(rng):
    decay, eps = 0.99, 1e-5
    state = make_state(rng)
    x = rng.normal(size=(32, 2, 4)).astype(np.float32)
    out, new_state = vq_apply(
        state, jnp.asarray(x), train=True, decay=decay, eps=eps
    )

    codebook = np.asarray(state.codebook)
    # use the model's own assignments: near-ties may resolve differently in
    # the f32 matmul-form distances than in f64 brute force; this test checks
    # the EMA arithmetic, not tie-breaking
    idx = np.asarray(out.indices)  # (N, L)
    onehot = np.eye(8, dtype=np.float32)[idx]  # (N, L, K)
    onehot_sum = onehot.sum(axis=0)  # (L, K)

    # reference update semantics (vq/vq.py:52-64)
    cluster = np.ones((2, 8), np.float32) * decay + onehot_sum * (1 - decay)
    total = cluster.sum(axis=-1, keepdims=True)
    smoothed = (cluster + eps) / (total + 8 * eps) * total
    dw = np.einsum("nlk,nld->lkd", onehot, x) / smoothed[:, :, None]
    expected = codebook * decay + dw * (1 - decay)

    np.testing.assert_allclose(
        np.asarray(new_state.codebook), expected, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state.cluster_size), cluster, rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(new_state.activation_count), onehot_sum, rtol=1e-6
    )


def test_eval_mode_does_not_update(rng):
    state = make_state(rng)
    x = jnp.asarray(rng.normal(size=(8, 2, 4)).astype(np.float32))
    _, new_state = vq_apply(state, x, train=False)
    np.testing.assert_array_equal(
        np.asarray(new_state.codebook), np.asarray(state.codebook)
    )
    # stats still accumulate in eval mode (reference accumulates in forward)
    assert float(jnp.sum(new_state.activation_count)) == 16.0


def test_perplexity_uniform_assignment():
    """If all K codes are used equally, perplexity == K."""
    K, D = 4, 2
    # codebook at distinct corners; inputs exactly on them, equally often
    codebook = jnp.asarray(
        [[[10.0, 0], [0, 10.0], [-10.0, 0], [0, -10.0]]], jnp.float32
    )
    state = VQState(
        codebook=codebook,
        cluster_size=jnp.ones((1, K)),
        activation_count=jnp.zeros((1, K)),
        accumulated_error=jnp.zeros((1, K)),
    )
    x = jnp.repeat(codebook[0][:, None, :], 3, axis=1).reshape(-1, 1, D)
    out, _ = vq_apply(state, x, train=False)
    np.testing.assert_allclose(float(out.perplexity), K, rtol=1e-4)


def test_reuse_inactive_pairs_dead_with_most_active(rng):
    state = make_state(rng, L=1, K=4, D=2)
    # codes 1 and 3 dead; activities: code 2 > code 0
    activation = jnp.asarray([[5.0, 0.0, 9.0, 0.0]])
    state = state.replace(activation_count=activation)
    new_state, reused = vq_reuse_inactive(state)
    assert int(reused) == 2
    cb = np.asarray(state.codebook)
    new_cb = np.asarray(new_state.codebook)
    # dead #0 (index 1) pairs with most active (index 2);
    # dead #1 (index 3) pairs with second most active (index 0)
    np.testing.assert_allclose(
        new_cb[0, 1], cb[0, 1] * 0.1 + cb[0, 2] * 0.9, rtol=1e-6
    )
    np.testing.assert_allclose(
        new_cb[0, 3], cb[0, 3] * 0.1 + cb[0, 0] * 0.9, rtol=1e-6
    )
    # live codes untouched
    np.testing.assert_array_equal(new_cb[0, 0], cb[0, 0])
    np.testing.assert_array_equal(new_cb[0, 2], cb[0, 2])


def test_reuse_inactive_noop_when_all_active(rng):
    state = make_state(rng)
    state = state.replace(activation_count=jnp.ones((2, 8)))
    new_state, reused = vq_reuse_inactive(state)
    assert int(reused) == 0
    np.testing.assert_array_equal(
        np.asarray(new_state.codebook), np.asarray(state.codebook)
    )


def test_reset_stats(rng):
    state = make_state(rng)
    state = state.replace(
        activation_count=jnp.ones((2, 8)), accumulated_error=jnp.ones((2, 8))
    )
    state = vq_reset_stats(state)
    assert float(jnp.sum(state.activation_count)) == 0
    assert float(jnp.sum(state.accumulated_error)) == 0


def test_vq_apply_jittable(rng):
    state = make_state(rng)
    x = jnp.asarray(rng.normal(size=(8, 2, 4)).astype(np.float32))
    jitted = jax.jit(lambda s, x: vq_apply(s, x, train=True))
    out, new_state = jitted(state, x)
    assert out.indices.shape == (8, 2)
    assert new_state.codebook.shape == (2, 8, 4)


def test_vq1_single_codebook(rng):
    key = jax.random.PRNGKey(0)
    state = vq1_init(key, num_embeddings=16, embedding_dim=4)
    x = jnp.asarray(rng.normal(size=(32, 4)).astype(np.float32))
    out, new_state = vq1_apply(state, x, train=True)
    assert out.indices.shape == (32,)
    assert out.quantized.shape == (32, 4)
    # codebook must equal ema_w / ema_cluster_size after a train step
    np.testing.assert_allclose(
        np.asarray(new_state.codebook),
        np.asarray(new_state.ema_w / new_state.ema_cluster_size[:, None]),
        rtol=1e-5,
    )


def test_vq_apply_under_sharding(rng):
    """Global-view EMA update must be identical when the batch is sharded."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    state = make_state(rng)
    x = jnp.asarray(rng.normal(size=(32, 2, 4)).astype(np.float32))

    out_ref, state_ref = jax.jit(lambda s, x: vq_apply(s, x, train=True))(
        state, x
    )

    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    state_repl = jax.device_put(state, NamedSharding(mesh, P()))
    out_sh, state_sh = jax.jit(lambda s, x: vq_apply(s, x, train=True))(
        state_repl, x_sharded
    )
    np.testing.assert_allclose(
        np.asarray(state_sh.codebook),
        np.asarray(state_ref.codebook),
        rtol=1e-5,
        atol=1e-6,
    )
    np.testing.assert_array_equal(
        np.asarray(out_sh.indices), np.asarray(out_ref.indices)
    )
