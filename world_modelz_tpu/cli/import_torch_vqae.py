"""Convert a reference (PyTorch) VqAutoEncoder checkpoint to this framework.

    python -m world_modelz_tpu.cli.import_torch_vqae \
        --torch_checkpoint mcvq_checkpoint_0075000.pth \
        --output_dir outputs/imported_tok

Reads the reference `train_vqae.py` checkpoint dict ({'step',
'model_state_dict', 'opt', ...} — minecraft/train_vqae.py:216-223),
maps the weights (utils/torch_import.py), validates them with a real
encode/decode roundtrip, and writes an orbax checkpoint that
`load_tokenizer` (and therefore every diffusion trainer's
`--decoder_model`) accepts. The embedded config is reconstructed from the
checkpoint's own argparse `opt`.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from world_modelz_tpu.utils import dataclass_cli
from world_modelz_tpu.utils.config import config_to_dict


@dataclasses.dataclass
class ImportTorchVqaeConfig:
    torch_checkpoint: str = ""  # reference .pth (required)
    output_dir: str = "outputs/imported_tok"
    platform: str = ""  # conversion runs fine on cpu
    image_size: int = 64  # recorded in the config for downstream probes


def run(cfg: ImportTorchVqaeConfig):
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    if not cfg.torch_checkpoint:
        raise ValueError("--torch_checkpoint (reference .pth) is required")

    import torch

    from world_modelz_tpu.cli.train_vqae import TrainVqaeConfig, make_tokenizer
    from world_modelz_tpu.train.checkpoint import save_checkpoint
    from world_modelz_tpu.utils.torch_import import tokenizer_state_from_torch

    # weights_only=False: the reference embeds its argparse Namespace (only
    # load checkpoints you trust — the same caveat as the reference's own
    # resume path)
    ckpt = torch.load(
        cfg.torch_checkpoint, map_location="cpu", weights_only=False
    )
    sd = ckpt.get("model_state_dict", ckpt)
    step = int(ckpt.get("step", 0))
    opt = ckpt.get("opt")
    opt_d = vars(opt) if opt is not None and not isinstance(opt, dict) else (
        opt or {}
    )

    state = tokenizer_state_from_torch(sd)
    in_channels = int(state.params["encoder"]["Conv_0"]["kernel"].shape[2])
    tok_cfg = TrainVqaeConfig(
        embedding_dim=int(opt_d.get("embedding_dim",
                                    state.vq.codebook.shape[-1])),
        num_embeddings=int(opt_d.get("num_embeddings",
                                     state.vq.codebook.shape[-2])),
        downscale_steps=int(
            opt_d.get(
                "downscale_steps",
                sum(1 for k in state.params["decoder"]
                    if k.startswith("UpscaleResidual")),
            )
        ),
        hidden_planes=int(opt_d.get("hidden_planes", 128)),
        in_channels=in_channels,
        image_size=cfg.image_size,
        name=str(opt_d.get("name", "imported")),
        output_dir=cfg.output_dir,
    )

    # validation roundtrip: apply() rejects any tree/shape mismatch, and
    # the output must be finite with the right token-grid shape
    tok = make_tokenizer(tok_cfg)
    probe = jnp.zeros((1, cfg.image_size, cfg.image_size, in_channels))
    z = tok.encode(state, probe)
    x = tok.decode(state, z)
    th, tw = tok.token_grid_shape((cfg.image_size, cfg.image_size))
    assert z.shape == (1, th, tw), (z.shape, (1, th, tw))
    assert bool(jnp.isfinite(x).all()), "non-finite decode from imported weights"

    path = save_checkpoint(
        cfg.output_dir, step, {"tokenizer": state}, config_to_dict(tok_cfg)
    )
    print(
        f"imported {cfg.torch_checkpoint} (step {step}, "
        f"{tok_cfg.num_embeddings} codes, dim {tok_cfg.embedding_dim}, "
        f"f{2**tok_cfg.downscale_steps}) -> {path}"
    )
    return path


def main(argv=None):
    run(dataclass_cli(ImportTorchVqaeConfig, argv))


if __name__ == "__main__":
    main()
