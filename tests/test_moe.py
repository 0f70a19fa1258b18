"""Expert-parallel MoE FFN (parallel/moe.py) on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from world_modelz_tpu.parallel.moe import (
    expert_shardings,
    moe_ffn,
    moe_init,
    moe_reference,
)


def test_moe_matches_per_token_reference(rng):
    """Dispatch-combine einsum path == dense per-token routing when capacity
    is lossless."""
    params = moe_init(jax.random.PRNGKey(0), dim=16, hidden=32, num_experts=4)
    x = jnp.asarray(rng.normal(size=(2, 24, 16)).astype(np.float32))
    y, aux = moe_ffn(params, x, capacity=24)
    y_ref = moe_reference(params, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=1e-4, atol=1e-5
    )
    assert float(aux) > 0


def test_moe_capacity_drops_overflow(rng):
    """With capacity 1, at most one token per (row, expert) contributes;
    dropped tokens get exactly zero output."""
    params = moe_init(jax.random.PRNGKey(1), dim=8, hidden=16, num_experts=2)
    x = jnp.asarray(rng.normal(size=(1, 12, 8)).astype(np.float32))
    y, _ = moe_ffn(params, x, capacity=1)
    y_ref = moe_reference(params, x)
    nonzero = np.asarray(jnp.any(jnp.abs(y) > 0, axis=-1))[0]
    assert nonzero.sum() <= 2  # <= one kept token per expert
    kept = np.where(nonzero)[0]
    np.testing.assert_allclose(
        np.asarray(y)[0, kept], np.asarray(y_ref)[0, kept],
        rtol=1e-4, atol=1e-5,
    )


def test_moe_expert_sharded_matches_unsharded(rng):
    """Params sharded over an 8-device 'expert' axis: jitted global-view
    result equals the unsharded one (XLA inserts the all-to-alls)."""
    e = 8
    params = moe_init(
        jax.random.PRNGKey(2), dim=16, hidden=32, num_experts=e
    )
    x = jnp.asarray(rng.normal(size=(2, 32, 16)).astype(np.float32))
    y_ref, aux_ref = moe_ffn(params, x, capacity=32)

    mesh = Mesh(np.array(jax.devices()[:e]), ("expert",))
    params_s = jax.device_put(params, expert_shardings(mesh))
    x_s = jax.device_put(x, NamedSharding(mesh, P()))
    y, aux = jax.jit(lambda p, x: moe_ffn(p, x, capacity=32))(params_s, x_s)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)


def test_moe_gradients_flow(rng):
    params = moe_init(jax.random.PRNGKey(3), dim=8, hidden=16, num_experts=4)
    x = jnp.asarray(rng.normal(size=(1, 16, 8)).astype(np.float32))

    def loss(p, x):
        y, aux = moe_ffn(p, x, capacity=16)
        return jnp.sum(y**2) + 0.01 * aux

    gp, gx = jax.grad(loss, argnums=(0, 1))(params, x)
    assert all(
        bool(jnp.isfinite(g).all()) for g in jax.tree_util.tree_leaves(gp)
    )
    assert float(jnp.abs(gx).sum()) > 0
    # every expert that received a token gets a weight gradient
    assert float(jnp.abs(gp.w_in).sum()) > 0
