"""Pipeline parallelism (parallel/pipeline.py) on the virtual CPU mesh.

Golden-tests the GPipe microbatch schedule against plain sequential layer
application: forward values, gradients (the backward pass is the transposed
schedule — reverse ppermutes inside the scan transpose), and composition
with a data axis.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from world_modelz_tpu.parallel.pipeline import (
    microbatch,
    pipeline_apply,
    stack_stage_params,
    unmicrobatch,
)


def _block(params, x):
    # small residual MLP block, shape-preserving
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    return x + h @ params["w2"]


def _stages(rng, n_stages, d, hidden):
    stages = []
    for _ in range(n_stages):
        stages.append(
            {
                "w1": jnp.asarray(rng.normal(size=(d, hidden)) * 0.3),
                "b1": jnp.asarray(rng.normal(size=(hidden,)) * 0.1),
                "w2": jnp.asarray(rng.normal(size=(hidden, d)) * 0.3),
            }
        )
    return stages


def _sequential(stages, x):
    for p in stages:
        x = _block(p, x)
    return x


def test_pipeline_matches_sequential(rng):
    n_stages, d, hidden = 4, 8, 16
    stages = _stages(rng, n_stages, d, hidden)
    stacked = stack_stage_params(stages)
    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("pipe",))

    x = jnp.asarray(rng.normal(size=(16, d)).astype(np.float32))
    xm = microbatch(x, 8)

    y_pipe = unmicrobatch(pipeline_apply(_block, stacked, xm, mesh))
    y_ref = _sequential(stages, x)
    np.testing.assert_allclose(
        np.asarray(y_pipe), np.asarray(y_ref), rtol=1e-5, atol=1e-6
    )


def test_pipeline_gradients_match_sequential(rng):
    n_stages, d, hidden = 4, 6, 12
    stages = _stages(rng, n_stages, d, hidden)
    stacked = stack_stage_params(stages)
    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("pipe",))
    x = jnp.asarray(rng.normal(size=(8, d)).astype(np.float32))
    tgt = jnp.asarray(rng.normal(size=(8, d)).astype(np.float32))

    def loss_pipe(stacked, x):
        y = unmicrobatch(pipeline_apply(_block, stacked, microbatch(x, 4), mesh))
        return jnp.mean((y - tgt) ** 2)

    def loss_ref(stacked, x):
        stages = [
            jax.tree_util.tree_map(lambda p: p[i], stacked)
            for i in range(n_stages)
        ]
        return jnp.mean((_sequential(stages, x) - tgt) ** 2)

    gp_p, gp_x = jax.grad(loss_pipe, argnums=(0, 1))(stacked, x)
    gr_p, gr_x = jax.grad(loss_ref, argnums=(0, 1))(stacked, x)
    for a, b in zip(
        jax.tree_util.tree_leaves(gp_p), jax.tree_util.tree_leaves(gr_p)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )
    np.testing.assert_allclose(
        np.asarray(gp_x), np.asarray(gr_x), rtol=1e-4, atol=1e-6
    )


def test_pipeline_composes_with_data_axis(rng):
    """('pipe', 'data') mesh: microbatch rows sharded over data while the
    stages stream over pipe."""
    n_stages, d, hidden = 2, 8, 8
    stages = _stages(rng, n_stages, d, hidden)
    stacked = stack_stage_params(stages)
    mesh = Mesh(
        np.array(jax.devices()[:8]).reshape(n_stages, 4), ("pipe", "data")
    )
    x = jnp.asarray(rng.normal(size=(16, d)).astype(np.float32))
    xm = microbatch(x, 2)  # (2, 8, d): 8 rows shard over data=4

    y = unmicrobatch(
        pipeline_apply(_block, stacked, xm, mesh, data_axis="data")
    )
    y_ref = _sequential(stages, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(y_ref), rtol=1e-5, atol=1e-6
    )


def test_microbatch_roundtrip_and_validation(rng):
    import pytest

    x = jnp.arange(24.0).reshape(6, 4)
    np.testing.assert_array_equal(
        np.asarray(unmicrobatch(microbatch(x, 3))), np.asarray(x)
    )
    with pytest.raises(ValueError):
        microbatch(x, 4)


def test_sparse_model_pipelined_matches_flax(rng):
    """sparse_forward_pipelined reproduces VqSparseDiffusionModel.apply on
    the SAME parameter tree — values and parameter gradients."""
    from world_modelz_tpu.models.video import VqSparseDiffusionModel
    from world_modelz_tpu.parallel.pipelined_sparse import (
        sparse_forward_pipelined,
        stack_transformer_layers,
    )

    shape, depth, dim = (4, 4, 4), 4, 16
    model = VqSparseDiffusionModel(
        shape=shape, dim=dim, num_classes=12, depth=depth, dim_head=8,
        mlp_dim=32, heads=2,
    )
    b, n = 8, 12
    tokens = jnp.asarray(rng.integers(0, 13, size=(b, n)), jnp.int32)
    indices = jnp.asarray(rng.integers(0, 64, size=(b, n)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), tokens, indices)["params"]

    mesh = Mesh(np.array(jax.devices()[:2]), ("pipe",))

    ref = model.apply({"params": params}, tokens, indices)
    out = sparse_forward_pipelined(
        model, params, tokens, indices, mesh, n_micro=4
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5
    )

    tgt = jnp.asarray(rng.normal(size=ref.shape).astype(np.float32))

    def loss_ref(p):
        return jnp.mean((model.apply({"params": p}, tokens, indices) - tgt) ** 2)

    def loss_pipe(p):
        y = sparse_forward_pipelined(
            model, p, tokens, indices, mesh, n_micro=4
        )
        return jnp.mean((y - tgt) ** 2)

    g_ref = jax.grad(loss_ref)(params)
    g_pipe = jax.jit(jax.grad(loss_pipe))(params)
    for a, b_ in zip(
        jax.tree_util.tree_leaves(g_pipe), jax.tree_util.tree_leaves(g_ref)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=1e-3, atol=1e-5
        )
    # sanity: the layer grouping really partitions the depth stack
    stacked = stack_transformer_layers(params, depth, 2)
    lead = jax.tree_util.tree_leaves(stacked)[0].shape[:2]
    assert lead == (2, 2)
