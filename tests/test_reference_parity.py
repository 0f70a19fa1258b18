"""Numerical parity vs the original PyTorch reference implementation.

These tests import the reference modules from /root/reference at runtime
(read-only mount) and compare our functional JAX implementations against
them on identical inputs/weights — the strongest form of the golden-test
idiom (SURVEY.md §4). Skipped automatically when the reference tree or torch
is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference tree not mounted", allow_module_level=True)


def _stub_module(name: str):
    """Install an empty placeholder for a heavy dependency the reference
    imports at module scope but the parity test never exercises
    (torchvision, wandb — unavailable in this environment)."""
    import types

    if name in sys.modules:
        return
    mod = types.ModuleType(name)

    def _getattr(attr):
        # dunder lookups must fail honestly: inspect.getmodule walks
        # sys.modules reading __file__, and a SimpleNamespace there breaks
        # unrelated tests (flax uses inspect during error reporting)
        if attr.startswith("__"):
            raise AttributeError(attr)
        return types.SimpleNamespace()  # tolerate use

    mod.__getattr__ = _getattr
    sys.modules[name] = mod


@pytest.fixture(scope="module")
def ref_vq_module():
    sys.path.insert(0, os.path.join(REF, "vq"))
    try:
        import vq as ref_vq  # noqa: F401

        return ref_vq
    finally:
        sys.path.pop(0)


def test_vq_forward_and_ema_parity(ref_vq_module, rng):
    """Same codebook + inputs -> same assignments, losses, perplexity, and
    EMA-updated codebook as the reference VectorQuantizerEMA."""
    import jax.numpy as jnp

    from world_modelz_tpu.ops.vq import VQState, vq_apply

    L, K, D, N = 2, 16, 8, 64
    codebook = rng.normal(size=(L, K, D)).astype(np.float32)
    x = rng.normal(size=(N, L, D)).astype(np.float32)

    # reference, in train mode
    ref = ref_vq_module.VectorQuantizerEMA(
        embedding_dim=D, num_embedding=K, num_latents=L
    )
    with torch.no_grad():
        ref.embedding.copy_(torch.from_numpy(codebook))
        ref.cluster_size.copy_(torch.ones(L, K))
    ref.train()
    t_q, t_enc, t_commit, t_ppl = ref.forward(torch.from_numpy(x.copy()))

    # ours
    state = VQState(
        codebook=jnp.asarray(codebook),
        cluster_size=jnp.ones((L, K)),
        activation_count=jnp.zeros((L, K)),
        accumulated_error=jnp.zeros((L, K)),
    )
    out, new_state = vq_apply(state, jnp.asarray(x), train=True)

    np.testing.assert_allclose(
        np.asarray(out.quantized),
        t_q.detach().numpy(),
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        float(out.commitment_loss), float(t_commit), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(out.perplexity), float(t_ppl), rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(new_state.codebook),
        ref.embedding.detach().numpy(),
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_state.cluster_size),
        ref.cluster_size.detach().numpy(),
        rtol=1e-5,
    )


def test_vq_encode_decode_parity(ref_vq_module, rng):
    import jax.numpy as jnp

    from world_modelz_tpu.ops.vq import VQState, vq_decode, vq_encode

    L, K, D, N = 1, 32, 16, 40
    codebook = rng.normal(size=(L, K, D)).astype(np.float32)
    x = rng.normal(size=(N, L, D)).astype(np.float32)

    ref = ref_vq_module.VectorQuantizerEMA(
        embedding_dim=D, num_embedding=K, num_latents=L
    )
    with torch.no_grad():
        ref.embedding.copy_(torch.from_numpy(codebook))
    ref.eval()
    t_idx = ref.encode(torch.from_numpy(x.copy()))
    t_dec = ref.decode(t_idx)

    state = VQState(
        codebook=jnp.asarray(codebook),
        cluster_size=jnp.ones((L, K)),
        activation_count=jnp.zeros((L, K)),
        accumulated_error=jnp.zeros((L, K)),
    )
    j_idx = vq_encode(state, jnp.asarray(x))
    np.testing.assert_array_equal(
        np.asarray(j_idx).reshape(-1), t_idx.numpy().reshape(-1)
    )
    j_dec = vq_decode(state, j_idx)
    np.testing.assert_allclose(
        np.asarray(j_dec).reshape(N, L, D),
        t_dec.numpy().reshape(N, L, D),
        rtol=1e-5,
    )


def test_local3d_attention_parity(rng):
    """Our windowed attention core vs the reference's pad+unfold
    local_attention on identical q/k/v tensors."""
    sys.path.insert(0, os.path.join(REF, "vq-video-diffusion"))
    try:
        from local_3d_attention import Local3dAttention as RefAttn
    finally:
        sys.path.pop(0)

    import jax.numpy as jnp

    from world_modelz_tpu.models.attention import local3d_attention

    extents, heads, dim_head = (1, 1, 1), 2, 4
    b, s, h, w = 2, 3, 4, 4
    inner = heads * dim_head
    q = rng.normal(size=(b, s, h, w, inner)).astype(np.float32)
    k = rng.normal(size=(b, s, h, w, inner)).astype(np.float32)
    v = rng.normal(size=(b, s, h, w, inner)).astype(np.float32)

    ref = RefAttn(extents, dim=inner, heads=heads, dim_head=dim_head)
    with torch.no_grad():
        t_out = ref.local_attention(
            torch.from_numpy(k.copy()),
            torch.from_numpy(v.copy()),
            torch.from_numpy(q.copy()),
        )
    # reference returns ((b s h w), heads, 1, dh) -> (b, s, h, w, inner)
    t_out = (
        t_out.reshape(b, s, h, w, heads, dim_head)
        .reshape(b, s, h, w, inner)
        .numpy()
    )

    j_out = np.asarray(
        local3d_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), extents, heads
        )
    )
    np.testing.assert_allclose(j_out, t_out, rtol=2e-4, atol=2e-5)


def test_loss_aware_sampler_parity(rng):
    """Histogram EMA update semantics vs the reference LossAwareSamplerEma."""
    sys.path.insert(0, os.path.join(REF, "minecraft"))
    try:
        from importance_sampling import LossAwareSamplerEma as RefSampler
    finally:
        sys.path.pop(0)

    import jax.numpy as jnp

    from world_modelz_tpu.train.importance import (
        loss_aware_init,
        loss_aware_update,
        loss_aware_weights,
    )

    ts = rng.uniform(size=200).astype(np.float32)
    losses = rng.uniform(size=200).astype(np.float32)

    ref = RefSampler(num_histogram_buckets=20, uniform_p=0.01, alpha=0.9,
                     warmup=2)
    ref.update_with_losses(torch.from_numpy(ts), torch.from_numpy(losses))

    state = loss_aware_init(num_buckets=20, uniform_p=0.01, alpha=0.9,
                            warmup=2)
    state = loss_aware_update(state, jnp.asarray(ts), jnp.asarray(losses))

    np.testing.assert_allclose(
        np.asarray(state.weights), ref._weights.numpy(), rtol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(state.counts), ref._counts.numpy()
    )
    np.testing.assert_allclose(
        np.asarray(loss_aware_weights(state)),
        ref.weights().numpy(),
        rtol=1e-5,
    )


def test_som_adapt_parity(rng):
    """SOM chunked Gaussian adaption vs the reference SomLayer.adapt."""
    _stub_module("torchvision")  # reference som.py imports it unused here
    sys.path.insert(0, os.path.join(REF, "som-diffusion"))
    try:
        from som import SomLayer as RefSom
    finally:
        sys.path.pop(0)

    import jax.numpy as jnp

    from world_modelz_tpu.ops.som import SomState, som_adapt

    W_, H_, D = 4, 4, 3
    emb = rng.uniform(-0.1, 0.1, (W_ * H_, D)).astype(np.float32)
    x = rng.uniform(0, 1, (50, D)).astype(np.float32)

    ref = RefSom(W_, H_, D)
    with torch.no_grad():
        ref.embedding.weight.copy_(torch.from_numpy(emb))
    t_err = ref.adapt(
        torch.from_numpy(x.copy()), alpha=0.2, sigma=1.5,
        adapt_batch_size=16, stats=True,
    )

    state = SomState(
        embedding=jnp.asarray(emb),
        activation_count=jnp.zeros((W_ * H_,), jnp.int32),
        width=W_,
        height=H_,
    )
    new_state, j_err = som_adapt(
        state, jnp.asarray(x), 0.2, 1.5, adapt_batch_size=16
    )

    np.testing.assert_allclose(float(j_err), float(t_err), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_state.embedding),
        ref.embedding.weight.detach().numpy(),
        rtol=1e-4,
        atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(new_state.activation_count),
        ref.activation_count.numpy(),
    )


def test_ddpm_alpha_parity():
    _stub_module("torchvision")
    _stub_module("wandb")
    sys.path.insert(0, os.path.join(REF, "som-diffusion"))
    try:
        import train_diffusion as ref_td
    finally:
        sys.path.pop(0)

    import jax.numpy as jnp

    from world_modelz_tpu.diffusion.ddpm import alpha_bar

    t = np.linspace(0, 1, 17).astype(np.float32)
    ref_a = ref_td.alpha_from_t(torch.from_numpy(t)).numpy()
    j_a = np.asarray(alpha_bar(jnp.asarray(t)))
    np.testing.assert_allclose(j_a, ref_a, rtol=1e-5)
