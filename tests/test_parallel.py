"""Tests for mesh construction, sharding rules, checkpointing, and the
driver entry points on a virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from world_modelz_tpu.parallel import (
    DEFAULT_TP_RULES,
    batch_sharding,
    make_mesh,
    replicated,
    shard_params,
)


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8 and mesh.shape["model"] == 1
    mesh = make_mesh(n_model=2)
    assert mesh.shape["data"] == 4 and mesh.shape["model"] == 2


def test_shard_params_rules_and_fallback():
    mesh = make_mesh(n_model=2)
    params = {
        "layer": {"to_qkv": {"kernel": jnp.zeros((16, 48))}},
        "ff_0": {"Dense_0": {"kernel": jnp.zeros((16, 64)),
                             "bias": jnp.zeros((64,))}},
        "odd": {"kernel": jnp.zeros((3, 5))},  # indivisible
    }
    sh = shard_params(params, mesh, DEFAULT_TP_RULES)
    assert sh["layer"]["to_qkv"]["kernel"].spec == P(None, "model")
    assert sh["ff_0"]["Dense_0"]["kernel"].spec == P(None, "model")
    # bias of column-split layer: no rule -> replicated
    assert sh["ff_0"]["Dense_0"]["bias"].spec == P()
    assert sh["odd"]["kernel"].spec == P()


def test_sharded_matmul_matches_replicated():
    mesh = make_mesh(n_model=2)
    x = jnp.arange(8 * 16, dtype=jnp.float32).reshape(8, 16)
    w = jnp.arange(16 * 32, dtype=jnp.float32).reshape(16, 32) / 100

    ref = x @ w
    xs = jax.device_put(x, batch_sharding(mesh))
    ws = jax.device_put(
        w, jax.sharding.NamedSharding(mesh, P(None, "model"))
    )
    out = jax.jit(lambda a, b: a @ b)(xs, ws)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from world_modelz_tpu.train.checkpoint import (
        latest_checkpoint,
        restore_checkpoint,
        save_checkpoint,
    )

    state = {"params": {"w": jnp.arange(4.0)}, "step_arr": jnp.int32(7)}
    cfg = {"dim": 64, "extents": [3, 1, 1]}
    path = save_checkpoint(str(tmp_path), 42, state, cfg)
    assert latest_checkpoint(str(tmp_path)) == path

    restored, step, config = restore_checkpoint(path)
    assert step == 42
    assert config["dim"] == 64
    np.testing.assert_array_equal(
        np.asarray(restored["params"]["w"]), np.arange(4.0)
    )


def test_graft_entry_single():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (2, 16, 16, 512)


def test_graft_entry_multichip():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
