"""Torch-checkpoint import: reference VqAutoEncoder weights -> TokenizerState.

Golden test against the REAL reference model (/root/reference, read-only):
random-init the reference `VqAutoEncoder` (minecraft/train_vqae.py:20-55),
convert its state_dict, and require identical token indices + matching
decodes. Skipped when torch or the reference tree is unavailable.
"""

import os
import sys
import types

import numpy as np
import pytest

REF = "/root/reference"

torch = pytest.importorskip("torch")
if not os.path.isdir(REF):  # pragma: no cover
    pytest.skip("reference tree not mounted", allow_module_level=True)


def _stub_module(name: str):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)

    def _getattr(attr):
        if attr.startswith("__"):  # keep inspect/import machinery sane
            raise AttributeError(attr)
        return types.SimpleNamespace()

    mod.__getattr__ = _getattr
    sys.modules[name] = mod


# generic module names the reference dirs shadow between each other
# (vq-video-diffusion and minecraft both have train_vqae, vq,
# importance_sampling, ... with diverged contents)
_REF_NAMES = (
    "train_vqae", "autoencoder", "vq", "local_3d_attention", "main",
    "transformer", "importance_sampling", "warmup_scheduler",
    "model_ema_v2", "buffered_traj_sampler", "sparse_diffusion",
    "data", "data.moving_mnist",
)


def _import_ref(subdir: str, module: str):
    """Import `module` from a reference subdir with the cross-dir
    generic names purged before AND after (the returned module object
    stays alive; only the sys.modules cache entries are dropped)."""
    import importlib

    for n in _REF_NAMES:
        sys.modules.pop(n, None)
    sys.path.insert(0, os.path.join(REF, subdir))
    try:
        return importlib.import_module(module)
    finally:
        sys.path.pop(0)
        for n in _REF_NAMES:
            sys.modules.pop(n, None)


@pytest.fixture(scope="module")
def ref_vqae_cls():
    for name in ("torchvision", "torchvision.transforms", "wandb",
                 "matplotlib", "matplotlib.pyplot"):
        _stub_module(name)
    return _import_ref("minecraft", "train_vqae").VqAutoEncoder


@pytest.fixture(scope="module")
def ref_model(ref_vqae_cls):
    torch.manual_seed(7)
    m = ref_vqae_cls(
        embedding_dim=8, num_embeddings=32, downscale_steps=2,
        hidden_planes=16, in_channels=1,
    )
    m.eval()
    return m


def _our_tokenizer():
    from world_modelz_tpu.models import VQAutoEncoder

    return VQAutoEncoder(
        embedding_dim=8, num_embeddings=32, downscale_steps=2,
        hidden_planes=16, in_channels=1,
    )


def test_torch_import_encode_decode_parity(ref_model):
    from world_modelz_tpu.utils.torch_import import tokenizer_state_from_torch

    state = tokenizer_state_from_torch(ref_model.state_dict())
    tok = _our_tokenizer()

    x = torch.rand(2, 1, 32, 32, generator=torch.Generator().manual_seed(3))
    with torch.no_grad():
        idx_ref = ref_model.encode(x)
        dec_ref = ref_model.decode(idx_ref)

    xj = x.permute(0, 2, 3, 1).numpy()
    z = np.asarray(tok.encode(state, xj))
    assert z.shape == (2, 8, 8)
    # identical codebook + encoder activations -> identical nearest codes
    np.testing.assert_array_equal(z, idx_ref.numpy())

    dec = np.asarray(tok.decode(state, z))
    np.testing.assert_allclose(
        dec, dec_ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=2e-4
    )


def test_torch_import_cli_roundtrip(ref_model, tmp_path):
    """Full migration path: reference .pth -> orbax checkpoint ->
    load_tokenizer -> encode, matching the source model."""
    import argparse

    from world_modelz_tpu.cli.import_torch_vqae import (
        ImportTorchVqaeConfig,
        run,
    )
    from world_modelz_tpu.cli.train_vqae import load_tokenizer

    pth = str(tmp_path / "ref_checkpoint_0000005.pth")
    torch.save(
        {
            "step": 5,
            "model_state_dict": ref_model.state_dict(),
            "opt": argparse.Namespace(
                embedding_dim=8, num_embeddings=32, downscale_steps=2,
                hidden_planes=16, name="ref_import",
            ),
        },
        pth,
    )
    out = str(tmp_path / "imported")
    path = run(ImportTorchVqaeConfig(
        torch_checkpoint=pth, output_dir=out, image_size=32,
    ))
    assert os.path.basename(path) == "step_0000005"

    tok, state, config = load_tokenizer(path)
    assert config["num_embeddings"] == 32 and config["in_channels"] == 1

    x = torch.rand(2, 1, 32, 32, generator=torch.Generator().manual_seed(9))
    with torch.no_grad():
        idx_ref = ref_model.encode(x)
    z = np.asarray(tok.encode(state, x.permute(0, 2, 3, 1).numpy()))
    np.testing.assert_array_equal(z, idx_ref.numpy())


@pytest.fixture(scope="module")
def ref_video_model():
    for name in ("torchvision", "torchvision.transforms", "wandb",
                 "matplotlib", "matplotlib.pyplot"):
        _stub_module(name)
    ref_main = _import_ref("vq-video-diffusion", "main")
    torch.manual_seed(11)
    m = ref_main.VqVideoDiffusionModel(
        data_shape=(3, 8, 8), dim=16, num_classes=32,
        extents=(1, 1, 1), depth=2, dim_head=8, mlp_dim=24, heads=2,
    )
    m.eval()
    return m


def test_torch_import_video_logits_parity(ref_video_model):
    """Imported denoiser weights produce the reference's logits exactly
    (same tokens in, same last-frame logits out)."""
    import jax.numpy as jnp

    from world_modelz_tpu.models.video import VqVideoDiffusionModel
    from world_modelz_tpu.utils.torch_import import video_params_from_torch

    params = video_params_from_torch(ref_video_model.state_dict())
    model = VqVideoDiffusionModel(
        data_shape=(3, 8, 8), dim=16, num_classes=32, extents=(1, 1, 1),
        depth=2, dim_head=8, mlp_dim=24, heads=2, backend="xla",
    )
    g = torch.Generator().manual_seed(4)
    tokens = torch.randint(0, 33, (2, 3, 8, 8), generator=g)  # incl. mask
    with torch.no_grad():
        ref_logits = ref_video_model(tokens).numpy()
    params = __import__("jax").tree_util.tree_map(jnp.asarray, params)
    logits = np.asarray(
        model.apply({"params": params}, jnp.asarray(tokens.numpy()))
    )
    # the only systematic difference is the GELU variant (flax tanh
    # approximation vs torch exact erf): observed max |diff| 1.4e-4 at
    # this scale, far below sampling noise
    np.testing.assert_allclose(logits, ref_logits, rtol=2e-3, atol=5e-4)


def test_torch_import_video_cli_roundtrip(ref_video_model, tmp_path):
    """Reference main.py .pth -> our checkpoint -> rollout-style restore."""
    import argparse

    from world_modelz_tpu.cli.import_torch_video import (
        ImportTorchVideoConfig,
        run,
    )
    from world_modelz_tpu.cli.video_diffusion import VideoDiffusionConfig
    from world_modelz_tpu.train.checkpoint import restore_checkpoint
    from world_modelz_tpu.utils.config import config_from_dict

    pth = str(tmp_path / "m_checkpoint.pth")
    torch.save(
        {
            "step": 11,
            "model_state_dict": ref_video_model.state_dict(),
            "ema_model_state_dict": ref_video_model.state_dict(),
            "opt": argparse.Namespace(
                heads=2, extents="1,1,1", ema_decay=0.999, name="m",
            ),
        },
        pth,
    )
    path = run(ImportTorchVideoConfig(
        torch_checkpoint=pth, output_dir=str(tmp_path / "out"),
        decoder_model="tok_placeholder", image_size=32,
    ))
    state, step, config = restore_checkpoint(path)
    assert step == 11
    cfg = config_from_dict(VideoDiffusionConfig, config)
    assert cfg.dim == 16 and cfg.depth == 2 and cfg.n_past == 2
    assert cfg.extents == (1, 1, 1) and cfg.heads == 2
    assert state["ema"]  # ema weights imported


@pytest.fixture(scope="module")
def ref_sparse_model():
    for name in ("torchvision", "torchvision.transforms", "wandb",
                 "matplotlib", "matplotlib.pyplot", "minerl"):
        _stub_module(name)
    ref_sparse = _import_ref("minecraft", "sparse_diffusion")
    torch.manual_seed(13)
    m = ref_sparse.VqSparseDiffusionModel(
        shape=(4, 8, 8), dim=16, num_classes=32, depth=2,
        dim_head=8, mlp_dim=24, heads=2,
    )
    m.eval()
    return m


def test_torch_import_sparse_logits_parity(ref_sparse_model):
    import jax.numpy as jnp

    from world_modelz_tpu.models.video import VqSparseDiffusionModel
    from world_modelz_tpu.utils.torch_import import sparse_params_from_torch

    params = sparse_params_from_torch(ref_sparse_model.state_dict())
    model = VqSparseDiffusionModel(
        shape=(4, 8, 8), num_classes=32, dim=16, depth=2, dim_head=8,
        mlp_dim=24, heads=2, attn_backend="xla",
    )
    g = torch.Generator().manual_seed(6)
    tokens = torch.randint(0, 33, (2, 24), generator=g)
    indices = torch.randint(0, 4 * 8 * 8, (2, 24), generator=g)
    with torch.no_grad():
        ref_logits = ref_sparse_model(tokens, indices).numpy()
    params = __import__("jax").tree_util.tree_map(jnp.asarray, params)
    logits = np.asarray(model.apply(
        {"params": params},
        jnp.asarray(tokens.numpy()), jnp.asarray(indices.numpy()),
    ))
    np.testing.assert_allclose(logits, ref_logits, rtol=2e-3, atol=5e-4)


def test_torch_import_sparse_cli_and_init_from(ref_sparse_model, tmp_path):
    """Reference sparse .pth -> our checkpoint -> the sparse trainer's
    weights-only --init_from warm start runs real steps from it."""
    import argparse

    from world_modelz_tpu.cli.import_torch_sparse import (
        ImportTorchSparseConfig,
        run,
    )
    from world_modelz_tpu.cli.sparse_diffusion import (
        SparseDiffusionConfig,
        train,
    )
    from world_modelz_tpu.cli.train_vqae import TrainVqaeConfig
    from world_modelz_tpu.cli.train_vqae import train as train_vqae

    pth = str(tmp_path / "sparse_checkpoint.pth")
    torch.save(
        {
            "step": 21,
            "model_state_dict": ref_sparse_model.state_dict(),
            "opt": argparse.Namespace(heads=2, num_context=24, name="s"),
        },
        pth,
    )
    # matching tokenizer: 32 codes, f4 at image 32 -> 8x8 grid
    tok_out = str(tmp_path / "tok")
    _state, info = train_vqae(TrainVqaeConfig(
        batch_size=8, image_size=32, max_steps=8, downscale_steps=2,
        embedding_dim=8, hidden_planes=16, num_embeddings=32,
        checkpoint_interval=8, vq_reuse_interval=4, log_interval=4,
        output_dir=tok_out, name="t",
    ))
    path = run(ImportTorchSparseConfig(
        torch_checkpoint=pth, output_dir=str(tmp_path / "imp"),
        decoder_model=info["checkpoint"], image_size=32,
    ))
    assert os.path.basename(path) == "step_0000021"

    out = str(tmp_path / "ft")
    cfg = SparseDiffusionConfig(
        decoder_model=info["checkpoint"], init_from=path,
        batch_size=2, eval_batch_size=1, max_steps=2, warmup=1,
        S=4, H=8, W=8, image_size=32, num_context=24,
        dim=16, mlp_dim=24, heads=2, depth=2,
        eval_interval=0, checkpoint_interval=2, buffer_size=120,
        max_segment_length=60, log_interval=1, output_dir=out, name="ft",
    )
    train(cfg)
    assert os.path.isdir(os.path.join(out, "step_0000002"))
