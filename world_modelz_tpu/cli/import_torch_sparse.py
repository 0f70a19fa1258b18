"""Convert a reference (PyTorch) sparse-diffusion checkpoint to this framework.

    python -m world_modelz_tpu.cli.import_torch_sparse \
        --torch_checkpoint sparse_checkpoint_0400000.pth \
        --decoder_model outputs/imported_tok/step_0002500 \
        --output_dir outputs/imported_sparse

Reads the reference `sparse_diffusion.py` checkpoint dict
(minecraft/sparse_diffusion.py:479-489 — base + EMA state_dicts + argparse
`opt`), maps the `VqSparseDiffusionModel` weights
(utils/torch_import.sparse_params_from_torch) and writes a checkpoint in
the sparse trainer's layout. Use it with the trainer's weights-only
`--init_from` flag (fresh optimizer — the torch Adam state is not
converted) for fine-tuning or eval-only runs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from world_modelz_tpu.utils import dataclass_cli
from world_modelz_tpu.utils.config import config_to_dict


@dataclasses.dataclass
class ImportTorchSparseConfig:
    torch_checkpoint: str = ""  # reference .pth (required)
    decoder_model: str = ""  # tokenizer checkpoint to record in the config
    output_dir: str = "outputs/imported_sparse"
    platform: str = ""
    image_size: int = 64


def run(cfg: ImportTorchSparseConfig):
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    if not cfg.torch_checkpoint:
        raise ValueError("--torch_checkpoint (reference .pth) is required")

    import torch

    from world_modelz_tpu.cli.sparse_diffusion import SparseDiffusionConfig
    from world_modelz_tpu.models.video import VqSparseDiffusionModel
    from world_modelz_tpu.train.checkpoint import save_checkpoint
    from world_modelz_tpu.train.importance import loss_aware_init
    from world_modelz_tpu.utils.torch_import import sparse_params_from_torch

    ckpt = torch.load(
        cfg.torch_checkpoint, map_location="cpu", weights_only=False
    )
    sd = ckpt.get("model_state_dict", ckpt)
    ema_sd = ckpt.get("ema_model_state_dict") or None
    step = int(ckpt.get("step", 0))
    opt = ckpt.get("opt")
    opt_d = vars(opt) if opt is not None and not isinstance(opt, dict) else (
        opt or {}
    )

    params = sparse_params_from_torch(sd)
    ema = sparse_params_from_torch(ema_sd) if ema_sd else {}

    s = params["pos_emb_s"]["embedding"].shape[0]
    h = params["pos_emb_h"]["embedding"].shape[0]
    w = params["pos_emb_w"]["embedding"].shape[0]
    dim = params["embedding"]["embedding"].shape[1]
    num_classes = params["logit_proj"]["kernel"].shape[1]
    tr = params["transformer"]
    depth = sum(1 for k in tr if k.startswith("DenseAttention_"))
    heads = int(opt_d.get("heads", 1))
    mlp_dim = tr["FeedForward_0"]["Dense_0"]["kernel"].shape[1]
    inner = tr["DenseAttention_0"]["to_qkv"]["kernel"].shape[1] // 3
    if inner != dim:
        # the reference trainer always uses dim_head = dim // heads
        # (sparse_diffusion.py:362); our config derives it the same way
        raise ValueError(
            f"QKV inner dim {inner} != model dim {dim}: this checkpoint "
            "was not produced by the reference sparse trainer"
        )

    train_cfg = SparseDiffusionConfig(
        decoder_model=cfg.decoder_model,
        image_size=cfg.image_size,
        S=s, H=h, W=w,
        dim=dim,
        mlp_dim=mlp_dim,
        heads=heads,
        depth=depth,
        num_context=int(opt_d.get("num_context", 512)),
        ema_decay=float(opt_d.get("ema_decay", 0.999 if ema_sd else 0.0))
        if ema_sd else 0.0,
        name=str(opt_d.get("name", "imported")),
        output_dir=cfg.output_dir,
    )

    # validation: apply() rejects any tree/shape mismatch
    model = VqSparseDiffusionModel(
        shape=(s, h, w), num_classes=num_classes, dim=dim, depth=depth,
        dim_head=dim // heads, mlp_dim=mlp_dim, heads=heads,
        attn_backend="xla",
    )
    to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    params, ema = to_j(params), to_j(ema)
    n = min(16, s * h * w)
    logits = model.apply(
        {"params": params},
        jnp.zeros((1, n), jnp.int32),
        jnp.arange(n, dtype=jnp.int32)[None],
    )
    assert logits.shape == (1, n, num_classes), logits.shape
    assert bool(jnp.isfinite(logits).all()), "non-finite imported forward"

    path = save_checkpoint(
        cfg.output_dir,
        step,
        {
            "params": params,
            "ema": ema,
            "opt_state": {},  # torch Adam state is not converted
            "sampler": loss_aware_init(),
        },
        config_to_dict(train_cfg),
    )
    print(
        f"imported {cfg.torch_checkpoint} (step {step}, dim {dim}, depth "
        f"{depth}, volume {s}x{h}x{w}, {num_classes} classes"
        f"{', +ema' if ema_sd else ''}) -> {path}"
    )
    return path


def main(argv=None):
    run(dataclass_cli(ImportTorchSparseConfig, argv))


if __name__ == "__main__":
    main()
