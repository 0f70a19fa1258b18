"""Induced-NaN integration tests: every trainer must reject poisoned steps.

Each test drives a real trainer loop with a failure injected (NaN input
data where the data path propagates it to the loss, or a NaN-emitting
denoiser where integer tokenization would launder NaN inputs) and asserts
that the nan_guard keeps the returned state finite — i.e. every poisoned
step was rejected on-device and the run completed instead of dying the
reference way (SURVEY.md §5 'failure detection').
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


def _all_finite(tree) -> bool:
    return all(
        bool(jnp.all(jnp.isfinite(x)))
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
    )


@pytest.fixture(scope="module")
def tokenizer_ckpt(tmp_path_factory):
    from world_modelz_tpu.cli.train_vqae import TrainVqaeConfig, train

    out = str(tmp_path_factory.mktemp("tok"))
    cfg = TrainVqaeConfig(
        batch_size=8, image_size=32, max_steps=8, downscale_steps=2,
        embedding_dim=8, hidden_planes=16, num_embeddings=32,
        checkpoint_interval=8, vq_reuse_interval=0, log_interval=4,
        output_dir=out, name="t",
    )
    _state, info = train(cfg)
    return info["checkpoint"]


def test_train_vqae_rejects_nan_batches(monkeypatch, tmp_path):
    """NaN pixels -> NaN recon loss -> every step rejected, state stays
    finite (without the guard the params would be NaN after step 1)."""
    import world_modelz_tpu.cli.train_vqae as mod

    def nan_batch_fn(cfg, seed):
        return (
            lambda: np.full(
                (cfg.batch_size, cfg.image_size, cfg.image_size, 3),
                np.nan,
                np.float32,
            ),
            None,
        )

    monkeypatch.setattr(mod, "build_batch_fn", nan_batch_fn)
    cfg = mod.TrainVqaeConfig(
        batch_size=8, image_size=16, max_steps=4, downscale_steps=1,
        embedding_dim=4, hidden_planes=8, num_embeddings=8,
        checkpoint_interval=0, vq_reuse_interval=0, log_interval=1,
        output_dir=str(tmp_path), name="nan",
    )
    state, _ = mod.train(cfg)
    assert _all_finite(state.params)
    assert _all_finite(state.vq)


def test_train_vqae_unguarded_poisons(monkeypatch, tmp_path):
    """Control: with nan_guard off the same injection corrupts the params,
    proving the guarded test exercises a real failure path."""
    import world_modelz_tpu.cli.train_vqae as mod

    def nan_batch_fn(cfg, seed):
        return (
            lambda: np.full(
                (cfg.batch_size, cfg.image_size, cfg.image_size, 3),
                np.nan,
                np.float32,
            ),
            None,
        )

    monkeypatch.setattr(mod, "build_batch_fn", nan_batch_fn)
    cfg = mod.TrainVqaeConfig(
        batch_size=8, image_size=16, max_steps=4, downscale_steps=1,
        embedding_dim=4, hidden_planes=8, num_embeddings=8, nan_guard=False,
        checkpoint_interval=0, vq_reuse_interval=0, log_interval=1,
        output_dir=str(tmp_path), name="nan",
    )
    state, _ = mod.train(cfg)
    assert not _all_finite(state.params)


def test_video_diffusion_rejects_nan_model(
    monkeypatch, tokenizer_ckpt, tmp_path
):
    """Integer tokens launder NaN inputs, so inject at the denoiser: a
    NaN-emitting logits head poisons loss AND grads every step."""
    import world_modelz_tpu.cli.video_diffusion as mod
    from world_modelz_tpu.models.video import VqVideoDiffusionModel

    class NaNModel(VqVideoDiffusionModel):
        def __call__(self, tokens, train=False):
            return super().__call__(tokens, train=train) * jnp.nan

    def make_nan_model(cfg, token_shape, num_embeddings, **kwargs):
        return NaNModel(
            data_shape=token_shape,
            dim=cfg.dim,
            num_classes=num_embeddings,
            extents=tuple(cfg.extents),
            depth=cfg.depth,
            mlp_dim=cfg.mlp_dim,
            dim_head=cfg.dim_head,
            heads=cfg.heads,
            dropout=cfg.dropout,
        )

    monkeypatch.setattr(mod, "make_model", make_nan_model)
    cfg = mod.VideoDiffusionConfig(
        dataset="synthetic", decoder_model=tokenizer_ckpt,
        batch_size=8, n_past=2, image_size=32, max_steps=4, warmup=2,
        dim=8, extents=(1, 1, 1), depth=1, mlp_dim=8, dim_head=4,
        heads=2, ema_decay=0.99, eval_interval=0, checkpoint_interval=0,
        log_interval=1, buffer_size=120, output_dir=str(tmp_path), name="nan",
    )
    params = mod.train(cfg)
    assert _all_finite(params)


def test_sparse_diffusion_rejects_nan_model(
    monkeypatch, tokenizer_ckpt, tmp_path
):
    import world_modelz_tpu.cli.sparse_diffusion as mod
    from world_modelz_tpu.models.video import VqSparseDiffusionModel

    class NaNSparse(VqSparseDiffusionModel):
        def __call__(self, tokens, indices, train=False):
            return super().__call__(tokens, indices, train=train) * jnp.nan

    monkeypatch.setattr(mod, "VqSparseDiffusionModel", NaNSparse)
    cfg = mod.SparseDiffusionConfig(
        decoder_model=tokenizer_ckpt, batch_size=8, eval_batch_size=1,
        max_steps=4, warmup=2, S=4, H=8, W=8, image_size=32,
        num_context=16, dim=8, mlp_dim=8, heads=2, depth=1,
        eval_interval=0, checkpoint_interval=0, buffer_size=120,
        max_segment_length=60, log_interval=1,
        output_dir=str(tmp_path), name="nan",
    )
    params = mod.train(cfg)
    assert _all_finite(params)


def test_som_train_ae_rejects_nan_batches(monkeypatch, tmp_path):
    import world_modelz_tpu.cli.som_pipeline as mod

    def nan_batch_fn(*args, **kwargs):
        batch_size, image_size = args[4], args[5]
        return lambda: np.full(
            (batch_size, image_size, image_size, 3), np.nan, np.float32
        )

    monkeypatch.setattr(mod, "_image_batch_fn", nan_batch_fn)
    cfg = mod.TrainAeConfig(
        batch_size=4, image_size=16, max_steps=4, downscale_steps=1,
        embedding_dim=4, hidden_planes=8, checkpoint_interval=0,
        log_interval=1, output_dir=str(tmp_path), name="nan",
    )
    state, _ = mod.train_ae(cfg)
    assert _all_finite(state.params)


def test_som_train_som_rejects_nan_batches(monkeypatch, tmp_path):
    """NaN latents -> NaN SOM error -> adaption rejected, map stays
    finite."""
    import world_modelz_tpu.cli.som_pipeline as mod

    ae_cfg = mod.TrainAeConfig(
        batch_size=4, image_size=16, max_steps=2, downscale_steps=1,
        embedding_dim=4, hidden_planes=8, checkpoint_interval=0,
        log_interval=1, output_dir=str(tmp_path / "ae"), name="ae",
    )
    _state, ae_ckpt = mod.train_ae(ae_cfg)

    def nan_batch_fn(*args, **kwargs):
        batch_size, image_size = args[4], args[5]
        return lambda: np.full(
            (batch_size, image_size, image_size, 3), np.nan, np.float32
        )

    monkeypatch.setattr(mod, "_image_batch_fn", nan_batch_fn)
    cfg = mod.TrainSomConfig(
        ae_checkpoint=ae_ckpt, batch_size=4, image_size=16, max_steps=4,
        som_width=8, som_height=8, adapt_batch_size=4,
        checkpoint_interval=0, log_interval=1,
        output_dir=str(tmp_path / "som"), name="nan",
    )
    state, _ = mod.train_som(cfg)
    assert _all_finite(state.som)


def test_som_train_diffusion_rejects_nan_dataset(tmp_path):
    """NaN latents in the diffusion dataset -> NaN eps target -> rejected."""
    import world_modelz_tpu.cli.som_pipeline as mod

    # stage-1 checkpoint to rehydrate the decoder from
    ae_cfg = mod.TrainAeConfig(
        batch_size=4, image_size=16, max_steps=2, downscale_steps=1,
        embedding_dim=4, hidden_planes=8, checkpoint_interval=0,
        log_interval=1, output_dir=str(tmp_path / "ae"), name="ae",
    )
    _state, ae_ckpt = mod.train_ae(ae_cfg)

    data = np.full((16, 8, 8, 2), np.nan, np.float32)
    npz = str(tmp_path / "nan_dataset.npz")
    np.savez(npz, data=data)

    cfg = mod.TrainDiffusionConfig(
        input_dataset=npz, decoder_model=ae_ckpt, batch_size=4,
        max_steps=4, warmup=2, model_channels=32, num_res_blocks=1,
        channel_mult=(1,), eval_interval=0, checkpoint_interval=0,
        log_interval=1, ema_decay=0.99, output_dir=str(tmp_path / "d"),
        name="nan",
    )
    params = mod.train_diffusion(cfg)
    assert _all_finite(params)


def test_masked_denoise_rejects_nan_model(monkeypatch, tmp_path):
    import world_modelz_tpu.cli.masked_denoise as mod
    from world_modelz_tpu.models.gmlp import GMLP

    class NaNGMLP(GMLP):
        def __call__(self, tokens, vq_embeddings=None, **kwargs):
            return (
                super().__call__(tokens, vq_embeddings, **kwargs) * jnp.nan
            )

    monkeypatch.setattr(mod, "GMLP", NaNGMLP)
    cfg = mod.MaskedDenoiseConfig(
        batch_size=4, image_size=16, level=3, d_model=16, depth=1,
        codebook_size=8, vq_steps=4, max_steps=4, eval_interval=0,
        checkpoint_interval=0, log_interval=1,
        output_dir=str(tmp_path), name="nan",
    )
    params, _vq = mod.train(cfg)
    assert _all_finite(params)
