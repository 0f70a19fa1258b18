"""AOT serving artifacts (aot.py): export -> load -> serve without model
code, with bit-for-bit parity against the live-model service."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from world_modelz_tpu.aot import AOTPrograms, export_service, ladder
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


@pytest.fixture(scope="module")
def artifact(stack, tmp_path_factory):
    tok, tok_state, model, params = stack
    out = str(tmp_path_factory.mktemp("aot"))
    meta = export_service(
        out, tok, tok_state, model, params,
        num_frames=2, num_iterations=2, sample_topk=-1, batch_size=4,
        seed_frames=S, image_size=IMG, channels=C,
        platforms=["cpu"],  # test runs on the CPU backend
    )
    assert meta["sizes"] == ladder(4) == [1, 2, 4]
    return out


def test_exported_program_parity(stack, artifact):
    """Deserialized StableHLO == the live jitted program, bit for bit,
    for the same weights, tokens, and PRNG key."""
    tok, tok_state, model, params = stack
    progs = AOTPrograms.load(artifact)

    rng = np.random.default_rng(1)
    seeds = jnp.asarray(
        rng.uniform(size=(2, S, IMG, IMG, C)).astype(np.float32)
    )
    tokens_aot = progs.encode(seeds)
    b, s, h, w, c = seeds.shape
    tokens_ref = tok.encode(
        tok_state, seeds.reshape(b * s, h, w, c)
    ).reshape(b, s, -1, tokens_aot.shape[-1])
    np.testing.assert_array_equal(
        np.asarray(tokens_aot), np.asarray(tokens_ref)
    )

    key = jax.random.PRNGKey(7)
    out_aot, ctx_aot = progs.rollout(tokens_aot, key)

    from world_modelz_tpu.diffusion import rollout_frames
    from world_modelz_tpu.serve import rolled_context

    gen = rollout_frames(
        key,
        lambda z: model.apply({"params": params}, z),
        tokens_ref,
        num_frames=2, num_classes=K, mask_token=K,
        num_iterations=2, sample_topk=-1,
    )
    t = gen.shape[1]
    dec = tok.decode(tok_state, gen.reshape(b * t, *gen.shape[2:]))
    np.testing.assert_array_equal(
        np.asarray(out_aot),
        np.asarray(dec.reshape(b, t, *dec.shape[1:])),
    )
    np.testing.assert_array_equal(
        np.asarray(ctx_aot), np.asarray(rolled_context(tokens_ref, gen))
    )


def test_aot_service_matches_live_service(stack, artifact):
    """A RolloutService running from the artifact serves the same clip
    as one running the live model (same seed, same single request)."""
    tok, tok_state, model, params = stack
    clip = (
        np.random.default_rng(2)
        .uniform(size=(S, IMG, IMG, C))
        .astype(np.float32)
    )

    with RolloutService(
        tok, tok_state, model, params,
        num_frames=2, num_iterations=2, batch_size=4, seed=5,
        max_wait_s=0.01,
    ) as live:
        ref = live.submit(clip).result(timeout=120)

    progs = AOTPrograms.load(artifact)
    with RolloutService(programs=progs, seed=5, max_wait_s=0.01) as aot:
        assert aot.num_frames == 2 and aot._sizes == [1, 2, 4]
        got = aot.submit(clip).result(timeout=120)
        # sessions (encode-once streaming) work from the artifact too
        sess = aot.open_session(clip)
        seg = sess.generate()

    np.testing.assert_array_equal(got, ref)
    assert seg.shape == (2, IMG, IMG, C)
    assert np.isfinite(seg).all()


def test_serve_http_build_service_from_artifact(artifact):
    """The serve_http CLI path: --exported builds a service with no
    checkpoint on disk at all."""
    from world_modelz_tpu.cli.serve_http import (
        ServeHTTPConfig,
        build_service,
    )

    svc, tag = build_service(
        ServeHTTPConfig(exported=artifact, batch_size=2, max_wait_s=0.01)
    )
    try:
        assert str(tag).startswith("aot:")
        clip = np.zeros((S, IMG, IMG, C), np.float32)
        out = svc.submit(clip).result(timeout=120)
        assert out.shape == (2, IMG, IMG, C)
        # ladder capped at --batch_size
        assert svc._sizes == [1, 2]
    finally:
        svc.close()
