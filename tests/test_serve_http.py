"""HTTP front-end over the rollout service (serve_http.py): protocol
round-trips, sessions over the wire, error paths, stats."""

import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from world_modelz_tpu.models import VQAutoEncoder
from world_modelz_tpu.models.video import VqVideoDiffusionModel
from world_modelz_tpu.serve import RolloutService
from world_modelz_tpu.serve_http import (
    HTTPSession,
    RolloutHTTPServer,
    http_generate,
)

S, IMG, C, K = 3, 16, 1, 16


@pytest.fixture(scope="module")
def server():
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
    svc = RolloutService(
        tok, tok_state, model, params,
        num_frames=2, num_iterations=2, batch_size=4, max_wait_s=0.05,
    )
    with RolloutHTTPServer(svc, port=0) as srv:
        yield srv
    svc.close()


def _url(server):
    return f"http://127.0.0.1:{server.port}"


def _clip(seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(size=(S, IMG, IMG, C)).astype(np.float32)


def test_http_healthz_and_stats(server):
    with urllib.request.urlopen(f"{_url(server)}/healthz", timeout=30) as r:
        assert json.loads(r.read()) == {"ok": True}
    with urllib.request.urlopen(f"{_url(server)}/stats", timeout=30) as r:
        stats = json.loads(r.read())
    assert "requests" in stats and "open_sessions" in stats


def test_http_generate_roundtrip(server):
    out = http_generate(_url(server), _clip(), timeout=300)
    assert out.shape == (2, IMG, IMG, C)
    assert out.dtype == np.float32
    assert np.isfinite(out).all()


def test_http_concurrent_requests_coalesce(server):
    """Simultaneous HTTP clients land in one device batch — the point of a
    threaded front-end over a coalescing service."""
    before = dict(server.service.stats)
    outs = [None] * 3

    def call(i):
        outs[i] = http_generate(_url(server), _clip(i), timeout=300)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for out in outs:
        assert out.shape == (2, IMG, IMG, C)
    d_req = server.service.stats["requests"] - before["requests"]
    d_bat = server.service.stats["batches"] - before["batches"]
    assert d_req == 3
    assert d_bat < 3  # at least two requests shared a batch


def test_http_session_flow(server):
    with HTTPSession(_url(server), _clip(7), timeout=300) as sess:
        a = sess.generate()
        b = sess.generate()
        assert a.shape == (2, IMG, IMG, C) and b.shape == (2, IMG, IMG, C)
        with urllib.request.urlopen(
            f"{_url(server)}/stats", timeout=30
        ) as r:
            assert json.loads(r.read())["open_sessions"] >= 1
    # closed: further generates 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(
            urllib.request.Request(
                f"{_url(server)}/v1/sessions/{sess.session_id}/generate",
                data=b"", method="POST",
            ),
            timeout=30,
        )
    assert ei.value.code == 404


def test_http_error_paths(server):
    # invalid body -> 400
    req = urllib.request.Request(
        f"{_url(server)}/v1/generate", data=b"not-an-npy", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    # wrong rank -> 400
    import io

    buf = io.BytesIO()
    np.save(buf, np.zeros((3, 3), np.float32))
    req = urllib.request.Request(
        f"{_url(server)}/v1/generate", data=buf.getvalue(), method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    # unknown path -> 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"{_url(server)}/nope", timeout=30)
    assert ei.value.code == 404
    # unknown session -> 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(
            urllib.request.Request(
                f"{_url(server)}/v1/sessions/99999", method="DELETE"
            ),
            timeout=30,
        )
    assert ei.value.code == 404


def test_http_queue_timeout(server):
    # generous deadline: request completes normally
    out = http_generate(_url(server), _clip(5), timeout=300,
                        queue_timeout_s=600.0)
    assert out.shape == (2, IMG, IMG, C)
    # malformed header (valid body) -> 400 naming the header
    import io

    buf = io.BytesIO()
    np.save(buf, _clip(6))
    req = urllib.request.Request(
        f"{_url(server)}/v1/generate", data=buf.getvalue(), method="POST",
        headers={"X-Timeout-S": "soon"},
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 400
    assert "X-Timeout-S" in ei.value.read().decode()


def test_http_bearer_auth(server):
    """A token-protected front-end: 401 without/with a wrong token,
    healthz stays open, the client helpers attach the header."""
    svc = server.service
    with RolloutHTTPServer(svc, port=0, auth_token="s3cret") as srv:
        url = f"http://127.0.0.1:{srv.port}"
        # healthz open for probes
        with urllib.request.urlopen(f"{url}/healthz", timeout=30) as r:
            assert json.loads(r.read()) == {"ok": True}
        # no token -> 401
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(f"{url}/stats", timeout=30)
        assert ei.value.code == 401
        # wrong token -> 401
        req = urllib.request.Request(
            f"{url}/stats", headers={"Authorization": "Bearer nope"}
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 401
        # right token: generate + session flow through the client helpers
        out = http_generate(url, _clip(7), timeout=300, token="s3cret")
        assert out.shape == (2, IMG, IMG, C)
        from world_modelz_tpu.serve_http import HTTPSession

        sess = HTTPSession(url, _clip(8), timeout=300, token="s3cret")
        assert sess.generate().shape == (2, IMG, IMG, C)
        sess.close()
