"""Batched rollout service (serve.py): coalescing, padding, futures."""

import threading

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from world_modelz_tpu.models import VQAutoEncoder
from world_modelz_tpu.models.video import VqVideoDiffusionModel
from world_modelz_tpu.serve import RolloutService

S, IMG, C, K = 3, 16, 1, 16


@pytest.fixture(scope="module")
def stack():
    tok = VQAutoEncoder(
        embedding_dim=8, num_embeddings=K, downscale_steps=2,
        hidden_planes=8, in_channels=C,
    )
    key = jax.random.PRNGKey(0)
    tok_state = tok.init(key, jnp.zeros((1, IMG, IMG, C)))
    h = w = IMG // 4
    model = VqVideoDiffusionModel(
        data_shape=(S, h, w), dim=16, num_classes=K, extents=(1, 1, 1),
        depth=1, dim_head=8, mlp_dim=16, heads=2, backend="xla",
    )
    params = model.init(key, jnp.zeros((1, S, h, w), jnp.int32))["params"]
    return tok, tok_state, model, params


def _service(stack, **kw):
    tok, tok_state, model, params = stack
    kw.setdefault("num_frames", 2)
    kw.setdefault("num_iterations", 2)
    kw.setdefault("batch_size", 4)
    return RolloutService(tok, tok_state, model, params, **kw)


def test_serve_batches_and_resolves(stack):
    rng = np.random.default_rng(0)
    with _service(stack, max_wait_s=0.5) as svc:
        futs = [
            svc.submit(rng.uniform(size=(S, IMG, IMG, C)).astype(np.float32))
            for _ in range(6)
        ]
        outs = [f.result(timeout=120) for f in futs]
    for out in outs:
        assert out.shape == (2, IMG, IMG, C)
        assert np.isfinite(out).all()
    assert svc.stats["requests"] == 6
    # 6 requests at batch_size 4 -> exactly 2 program runs (coalesced)
    assert svc.stats["batches"] == 2


def test_serve_single_request_uses_small_program(stack):
    """The compiled-size ladder: a lone request runs the size-1 program
    instead of padding to the full batch (round-2 review: padding by
    repetition wasted compute at low occupancy)."""
    rng = np.random.default_rng(1)
    with _service(stack, max_wait_s=0.01) as svc:
        out = svc.submit(
            rng.uniform(size=(S, IMG, IMG, C)).astype(np.float32)
        ).result(timeout=120)
    assert out.shape == (2, IMG, IMG, C)
    assert svc.stats["requests"] == 1
    assert svc.stats["batches"] == 1
    assert svc.stats["batched_rows"] == 1  # ladder size 1, not batch 4
    assert svc.stats["padded_rows"] == 0


def test_serve_ladder_pads_to_next_size(stack):
    """3 requests at batch 4 -> the size-4 program with one padded row,
    tracked in stats."""
    rng = np.random.default_rng(3)
    with _service(stack, max_wait_s=0.5) as svc:
        futs = [
            svc.submit(rng.uniform(size=(S, IMG, IMG, C)).astype(np.float32))
            for _ in range(3)
        ]
        [f.result(timeout=120) for f in futs]
    assert svc.stats["batches"] == 1
    assert svc.stats["batched_rows"] == 4
    assert svc.stats["padded_rows"] == 1


def test_serve_session_reuses_encoding(stack):
    """Streaming session: the seed clip is encoded exactly once; each
    generate() continues from the device-rolled token context."""
    rng = np.random.default_rng(4)
    clip = rng.uniform(size=(S, IMG, IMG, C)).astype(np.float32)
    with _service(stack, max_wait_s=0.01) as svc:
        sess = svc.open_session(clip)
        ctx0 = np.array(sess._ctx)
        a = sess.generate()
        ctx1 = np.array(sess._ctx)
        b = sess.generate()
    assert a.shape == (2, IMG, IMG, C) and b.shape == (2, IMG, IMG, C)
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert svc.stats["encoded_clips"] == 1  # only open_session encoded
    assert svc.stats["session_rows"] == 2
    # the context advanced: oldest frames dropped, generated tokens in
    assert ctx0.shape == ctx1.shape
    assert not np.array_equal(ctx0, ctx1)
    # generation slot (last frame) is carried through unchanged
    np.testing.assert_array_equal(ctx0[-1], ctx1[-1])


def test_serve_session_single_flight(stack):
    rng = np.random.default_rng(5)
    clip = rng.uniform(size=(S, IMG, IMG, C)).astype(np.float32)
    with _service(stack, max_wait_s=0.3) as svc:
        sess = svc.open_session(clip)
        f1 = sess.generate_async()
        with pytest.raises(RuntimeError):
            sess.generate_async()
        f1.result(timeout=120)
        sess.generate()  # fine after the first resolves


def test_rolled_context_math():
    """rolled_context == the final scan carry of rollout_frames' shift."""
    from world_modelz_tpu.serve import rolled_context

    tokens = jnp.arange(2 * 4 * 1 * 1).reshape(2, 4, 1, 1)
    gen = 100 + jnp.arange(2 * 2 * 1 * 1).reshape(2, 2, 1, 1)
    # emulate the scan: ctx = concat(ctx[:,1:-1], frame, ctx[:,-1:])
    ctx = tokens
    for t in range(gen.shape[1]):
        ctx = jnp.concatenate(
            [ctx[:, 1:-1], gen[:, t : t + 1], ctx[:, -1:]], axis=1
        )
    np.testing.assert_array_equal(
        np.asarray(rolled_context(tokens, gen)), np.asarray(ctx)
    )


def test_serve_concurrent_submitters(stack):
    rng = np.random.default_rng(2)
    results = {}
    with _service(stack, max_wait_s=0.2) as svc:

        def client(i):
            clip = rng.uniform(size=(S, IMG, IMG, C)).astype(np.float32)
            results[i] = svc.submit(clip).result(timeout=120)

        threads = [
            threading.Thread(target=client, args=(i,)) for i in range(5)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert set(results) == set(range(5))
    for out in results.values():
        assert out.shape == (2, IMG, IMG, C)


def test_serve_error_propagates_and_close_rejects(stack):
    with _service(stack, max_wait_s=0.01) as svc:
        # wrong channel count: the tokenizer's stem conv must reject it
        bad = svc.submit(np.zeros((S, IMG, IMG, C + 1), np.float32))
        with pytest.raises(Exception):
            bad.result(timeout=120)
    with pytest.raises(RuntimeError):
        svc.submit(np.zeros((S, IMG, IMG, C), np.float32))


def test_serve_deadline_sheds_stale_requests(stack):
    """A request whose queue deadline passes resolves to TimeoutError and
    never occupies a batch row; live requests are unaffected."""
    rng = np.random.default_rng(3)
    clip = rng.uniform(size=(S, IMG, IMG, C)).astype(np.float32)
    with _service(stack, max_wait_s=0.01) as svc:
        # warm the size-1 program so timing below isn't compile-dominated
        svc.submit(clip).result(timeout=300)

        # block the worker with a long-wait batch, then pile up: one
        # already-expired request and one without a deadline
        gate = svc.submit(clip)
        expired = svc.submit(clip, timeout_s=0.0)
        live = svc.submit(clip)
        with pytest.raises(TimeoutError):
            expired.result(timeout=120)
        assert live.result(timeout=120).shape == (2, IMG, IMG, C)
        assert gate.result(timeout=120).shape == (2, IMG, IMG, C)
    assert svc.stats["expired"] == 1
    # the expired request must not have been padded into a program
    assert svc.stats["requests"] == 3


def test_serve_adaptive_wait_skips_for_slow_arrivals(stack):
    """adaptive_wait: when the observed arrival rate cannot fill a batch
    within max_wait_s, the worker runs what it has instead of idling."""
    import time

    rng = np.random.default_rng(4)
    clip = rng.uniform(size=(S, IMG, IMG, C)).astype(np.float32)
    with _service(stack, max_wait_s=2.0, adaptive_wait=True) as svc:
        # prime the arrival-rate estimate: ~1 s gaps, batch_size 4 would
        # need ~3 s of waiting > max_wait 2 s
        svc.submit(clip).result(timeout=300)  # also warms the size-1 prog
        time.sleep(1.0)
        svc.submit(clip).result(timeout=120)
        time.sleep(1.0)
        t0 = time.monotonic()
        svc.submit(clip).result(timeout=120)
        latency = time.monotonic() - t0
    assert svc.stats["wait_skipped"] >= 1
    # the lone request did not pay the 2 s coalescing wait
    assert latency < 1.9, latency
