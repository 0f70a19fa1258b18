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


def test_serve_single_request_pads(stack):
    rng = np.random.default_rng(1)
    with _service(stack, max_wait_s=0.01) as svc:
        out = svc.submit(
            rng.uniform(size=(S, IMG, IMG, C)).astype(np.float32)
        ).result(timeout=120)
    assert out.shape == (2, IMG, IMG, C)
    assert svc.stats == {"requests": 1, "batches": 1, "batched_rows": 4}


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
