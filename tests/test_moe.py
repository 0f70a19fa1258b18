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


def test_moe_model_matches_reference_impl_incl_grads(rng):
    """VERDICT r2 #5: the MoE FFN wired into the REAL sparse-diffusion
    model. With lossless capacity the dispatch path must match the
    per-token reference path — values AND gradients."""
    from world_modelz_tpu.models.video import VqSparseDiffusionModel

    e = 4
    kw = dict(
        shape=(4, 4, 4),
        num_classes=12,
        dim=16,
        depth=2,
        dim_head=8,
        mlp_dim=32,
        heads=2,
        moe_experts=e,
        moe_capacity_factor=float(e),  # capacity = N -> lossless
    )
    m_disp = VqSparseDiffusionModel(**kw, moe_impl="dispatch")
    m_ref = VqSparseDiffusionModel(**kw, moe_impl="reference")

    toks = jnp.asarray(rng.integers(0, 13, size=(2, 24)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 64, size=(2, 24)), jnp.int32)
    params = m_disp.init(jax.random.PRNGKey(0), toks, idx)["params"]
    # param tree must contain the expert-stacked leaves
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    paths = ["/".join(str(getattr(p, "key", p)) for p in pa) for pa, _ in flat]
    assert any("MoEFeedForward_0" in p and p.endswith("w_in") for p in paths)

    def loss(model, p):
        logits, aux_vars = model.apply(
            {"params": p}, toks, idx, mutable=["losses"]
        )
        aux = sum(
            jnp.mean(a)
            for a in jax.tree_util.tree_leaves(aux_vars["losses"])
        )
        return jnp.sum(logits**2) * 1e-3 + 0.01 * aux

    l1, g1 = jax.value_and_grad(lambda p: loss(m_disp, p))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(m_ref, p))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
        )


def test_moe_model_expert_sharded_step(rng):
    """Expert-sharded (2 data x 4 'model'=expert) jitted grad step through
    the real model matches the single-device result, and the expert leaves
    really are sharded (DEFAULT_TP_RULES MoE rules)."""
    from world_modelz_tpu.models.video import VqSparseDiffusionModel
    from world_modelz_tpu.parallel.mesh import (
        DEFAULT_TP_RULES,
        batch_sharding,
        make_mesh,
        shard_params,
    )

    model = VqSparseDiffusionModel(
        shape=(4, 4, 4),
        num_classes=12,
        dim=16,
        depth=1,
        dim_head=8,
        mlp_dim=32,
        heads=2,
        moe_experts=4,
        moe_capacity_factor=4.0,
    )
    toks = jnp.asarray(rng.integers(0, 13, size=(4, 24)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 64, size=(4, 24)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), toks, idx)["params"]

    def loss(p, t, i):
        logits, aux_vars = model.apply(
            {"params": p}, t, i, mutable=["losses"]
        )
        aux = sum(
            jnp.mean(a)
            for a in jax.tree_util.tree_leaves(aux_vars["losses"])
        )
        return jnp.mean(logits**2) + 0.01 * aux

    g_ref = jax.grad(loss)(params, toks, idx)

    mesh = make_mesh(n_data=2, n_model=4)
    shardings = shard_params(params, mesh, DEFAULT_TP_RULES)
    p_s = jax.device_put(params, shardings)
    # the expert axis of w_in must be split over 'model'
    w_in_spec = None
    for pa, s in jax.tree_util.tree_flatten_with_path(shardings)[0]:
        path = "/".join(str(getattr(x, "key", x)) for x in pa)
        if "MoEFeedForward_0" in path and path.endswith("w_in"):
            w_in_spec = s.spec
    assert w_in_spec == P("model", None, None)

    t_s = jax.device_put(toks, batch_sharding(mesh))
    i_s = jax.device_put(idx, batch_sharding(mesh))
    g_s = jax.jit(jax.grad(loss))(p_s, t_s, i_s)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_s)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6
        )
