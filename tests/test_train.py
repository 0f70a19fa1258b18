"""Tests for schedules, EMA, and the loss-aware importance sampler."""

import jax
import jax.numpy as jnp
import numpy as np

from world_modelz_tpu.train import (
    ema_init,
    ema_update,
    loss_aware_init,
    loss_aware_sample,
    loss_aware_update,
    loss_aware_weights,
    make_optimizer,
    step_decay_schedule,
    uniform_sample,
    warmup_cosine_schedule,
)
from world_modelz_tpu.train.importance import loss_aware_warmed_up


def test_warmup_cosine_shape():
    sched = warmup_cosine_schedule(1e-3, warmup_steps=100, total_steps=1000)
    assert float(sched(0)) == 0.0
    np.testing.assert_allclose(float(sched(50)), 5e-4, rtol=1e-5)
    np.testing.assert_allclose(float(sched(100)), 1e-3, rtol=1e-5)
    # cosine tail decays monotonically to ~0
    assert float(sched(600)) < 1e-3
    assert float(sched(1100)) < float(sched(600))


def test_host_schedule_matches_and_stays_on_host():
    """host_schedule returns plain floats matching the eager schedule.

    Trainers read the log-point lr through it so a relayed-TPU default
    backend never sees a per-log-point RPC (cli/video_diffusion.py)."""
    from world_modelz_tpu.train import host_schedule

    sched = warmup_cosine_schedule(1e-3, warmup_steps=100, total_steps=1000)
    read = host_schedule(sched)
    for step in (0, 50, 100, 600, 1100):
        v = read(step)
        assert isinstance(v, float)
        np.testing.assert_allclose(v, float(sched(step)), rtol=1e-6)


def test_step_decay():
    sched = step_decay_schedule(1e-3, steps_per_epoch=10, epoch_step_size=3)
    np.testing.assert_allclose(float(sched(0)), 1e-3)
    np.testing.assert_allclose(float(sched(29)), 1e-3)
    np.testing.assert_allclose(float(sched(30)), 5e-4)
    np.testing.assert_allclose(float(sched(60)), 2.5e-4)


def test_ema_update_math():
    ema = {"w": jnp.ones((3,))}
    new = {"w": jnp.zeros((3,))}
    out = ema_update(ema, new, decay=0.9)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.9 * np.ones(3), rtol=1e-6)
    init = ema_init(new)
    np.testing.assert_array_equal(np.asarray(init["w"]), np.zeros(3))


def test_loss_aware_sampler_uniform_until_warm():
    state = loss_aware_init(num_buckets=10, warmup=2)
    assert not bool(loss_aware_warmed_up(state))
    w = np.asarray(loss_aware_weights(state))
    np.testing.assert_allclose(w, np.full(10, 0.1), rtol=1e-6)


def test_loss_aware_sequential_ema_semantics():
    """Two hits on the same bucket apply the EMA twice, in order
    (importance_sampling.py:40-41)."""
    state = loss_aware_init(num_buckets=4, alpha=0.5)
    ts = jnp.asarray([0.1, 0.1])  # both bucket 0
    losses = jnp.asarray([2.0, 4.0])
    new = loss_aware_update(state, ts, losses)
    # w0 = ((1*0.5 + 2*0.5) * 0.5 + 4*0.5) = 2.75
    np.testing.assert_allclose(float(new.weights[0]), 2.75, rtol=1e-6)
    assert int(new.counts[0]) == 2


def test_loss_aware_sampler_biases_toward_lossy_buckets():
    state = loss_aware_init(num_buckets=10, warmup=1, uniform_p=0.01)
    key = jax.random.PRNGKey(0)
    # feed losses: bucket 9 has 10x the loss of the others
    for i in range(30):
        ts = jnp.asarray(np.linspace(0.001, 0.999, 10))
        losses = jnp.where(ts > 0.9, 10.0, 1.0)
        state = loss_aware_update(state, ts, losses)
    assert bool(loss_aware_warmed_up(state))
    samples = np.asarray(loss_aware_sample(state, key, 4000))
    assert samples.min() >= 0 and samples.max() <= 1
    high = np.mean(samples > 0.9)
    low = np.mean(samples < 0.1)
    assert high > 3 * low  # lossy bucket sampled much more often


def test_loss_aware_update_jits():
    state = loss_aware_init()
    step = jax.jit(loss_aware_update)
    new = step(state, jnp.asarray([0.5]), jnp.asarray([1.0]))
    assert int(jnp.sum(new.counts)) == 1


def test_uniform_sampler():
    s = uniform_sample(jax.random.PRNGKey(0), 1000)
    assert s.shape == (1000,)
    assert 0.4 < float(s.mean()) < 0.6


def test_make_optimizer():
    import optax

    opt = make_optimizer("adamw", 1e-3, weight_decay=0.01)
    params = {"w": jnp.ones((4,))}
    state = opt.init(params)
    grads = {"w": jnp.ones((4,))}
    updates, _ = opt.update(grads, state, params)
    assert jax.tree_util.tree_structure(updates) == jax.tree_util.tree_structure(params)
