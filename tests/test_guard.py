"""Tests for failure detection / recovery and integration overfit checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from world_modelz_tpu.train.guard import (
    RestartManager,
    finite_guard,
    tree_all_finite,
)


def test_tree_all_finite():
    assert bool(tree_all_finite({"a": jnp.ones(3), "b": jnp.zeros(2)}))
    assert not bool(tree_all_finite({"a": jnp.asarray([1.0, jnp.nan])}))
    assert not bool(tree_all_finite({"a": jnp.asarray([jnp.inf])}))
    # integer leaves are ignored (token arrays etc.)
    assert bool(tree_all_finite({"a": jnp.asarray([1, 2], jnp.int32)}))


def test_finite_guard_rejects_bad_step():
    old = {"w": jnp.ones(4)}
    bad = {"w": jnp.asarray([1.0, jnp.nan, 3.0, 4.0])}
    good = {"w": jnp.full(4, 2.0)}

    state, ok = finite_guard(old, bad)
    assert not bool(ok)
    np.testing.assert_array_equal(np.asarray(state["w"]), np.ones(4))

    state, ok = finite_guard(old, good)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(state["w"]), np.full(4, 2.0))


def test_finite_guard_jits():
    step = jax.jit(finite_guard)
    old = {"w": jnp.ones(2)}
    new = {"w": jnp.asarray([jnp.nan, 1.0])}
    state, ok = step(old, new)
    assert not bool(ok)


def test_restart_manager():
    mgr = RestartManager(max_rejects=3)
    for _ in range(2):
        mgr.record(False)
    assert not mgr.should_restore()
    mgr.record(True)  # resets
    for _ in range(3):
        mgr.record(False)
    assert mgr.should_restore()
    assert mgr.restores == 1
    assert not mgr.should_restore()  # counter reset after restore


@pytest.mark.slow
def test_single_batch_overfit_tokenizer():
    """Single-batch overfit (reference idiom 3, SURVEY.md §4): the tokenizer
    must memorize one batch far better than fresh data in few steps."""
    import optax

    from world_modelz_tpu.models import VQAutoEncoder

    tok = VQAutoEncoder(
        embedding_dim=8, num_embeddings=32, downscale_steps=2,
        hidden_planes=16,
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (4, 16, 16, 3))
    state = tok.init(key, x)
    opt = optax.adam(3e-3)
    opt_state = opt.init(state.params)

    @jax.jit
    def step(state, opt_state, x):
        def loss(p):
            st = state.replace(params=p)
            recon, out, new_state = tok.forward(st, x, train=True)
            return (
                jnp.mean(jnp.abs(recon - x)) + 0.005 * out.commitment_loss,
                new_state,
            )

        (l, new_state), g = jax.value_and_grad(loss, has_aux=True)(
            state.params
        )
        updates, opt_state = opt.update(g, opt_state)
        return (
            new_state.replace(
                params=optax.apply_updates(state.params, updates)
            ),
            opt_state,
            l,
        )

    first = None
    for i in range(250):
        state, opt_state, l = step(state, opt_state, x)
        if first is None:
            first = float(l)
    assert float(l) < 0.25 * first, (first, float(l))


def test_checkpoint_guard_escalates_to_restore():
    from world_modelz_tpu.train.guard import CheckpointGuard

    calls = []
    guard = CheckpointGuard(lambda: calls.append(1) or "RESTORED",
                            max_rejects=3)
    # a healthy streak never restores
    for _ in range(10):
        assert guard.record(True) is None
    # rejections below the threshold don't either, and a success resets
    assert guard.record(False) is None
    assert guard.record(False) is None
    assert guard.record(True) is None
    assert guard.record(False) is None
    assert guard.record(False) is None
    assert calls == []
    # the third consecutive rejection trips the restore
    assert guard.record(False) == "RESTORED"
    assert calls == [1]
    assert guard.manager.restores == 1
    # counters reset after a restore
    assert guard.record(False) is None
