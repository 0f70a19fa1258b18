"""Convert a reference (PyTorch) video-diffusion checkpoint to this framework.

    python -m world_modelz_tpu.cli.import_torch_video \
        --torch_checkpoint model3_checkpoint_0075000.pth \
        --decoder_model outputs/imported_tok/step_0000005 \
        --output_dir outputs/imported_m3

Reads the reference `main.py`/`main2.py` checkpoint dict ({'step',
'model_state_dict', 'ema_model_state_dict', 'opt', ...} —
minecraft/main2.py:302-314), maps the `VqVideoDiffusionModel` weights
(utils/torch_import.video_params_from_torch) and writes a checkpoint in
the video trainer's layout, so `rollout.py`, `serve_http` and
`main.py --eval` consume it directly (weights-only restore). The model
architecture is derived from the state_dict itself (position-table /
projection shapes); `heads` and `extents` come from the embedded `opt`.

`--decoder_model` should point at the matching tokenizer — for a full
reference migration, convert that first with `import_torch_vqae`.
Resuming *training* from an imported checkpoint needs `--eval`-style
weights-only flows or a fresh optimizer (the torch Adam state is not
converted).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from world_modelz_tpu.utils import dataclass_cli
from world_modelz_tpu.utils.config import config_to_dict


@dataclasses.dataclass
class ImportTorchVideoConfig:
    torch_checkpoint: str = ""  # reference .pth (required)
    decoder_model: str = ""  # tokenizer checkpoint to record in the config
    output_dir: str = "outputs/imported_video"
    platform: str = ""
    image_size: int = 64  # recorded for downstream probes


def run(cfg: ImportTorchVideoConfig):
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    if not cfg.torch_checkpoint:
        raise ValueError("--torch_checkpoint (reference .pth) is required")

    import torch

    from world_modelz_tpu.cli.video_diffusion import (
        VideoDiffusionConfig,
        make_model,
    )
    from world_modelz_tpu.train.checkpoint import save_checkpoint
    from world_modelz_tpu.train.importance import loss_aware_init
    from world_modelz_tpu.utils.torch_import import video_params_from_torch

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

    params = video_params_from_torch(sd)
    ema = video_params_from_torch(ema_sd) if ema_sd else {}

    # architecture from the weights themselves; heads/extents from opt
    tr = params["transformer"]
    s = tr["pos_emb_s"]["embedding"].shape[0]
    h = tr["pos_emb_h"]["embedding"].shape[0]
    w = tr["pos_emb_w"]["embedding"].shape[0]
    dim = tr["embedding"]["embedding"].shape[1]
    num_classes = params["logit_proj"]["kernel"].shape[1]
    depth = sum(1 for k in tr if k.startswith("attn_norm_"))
    heads = int(opt_d.get("heads", 1))
    inner = tr["attn_0"]["to_q"]["kernel"].shape[1]
    mlp_dim = tr["ff_0"]["Dense_0"]["kernel"].shape[1]
    extents = opt_d.get("extents", opt_d.get("extent", "3,3,3"))
    if isinstance(extents, str):
        extents = tuple(int(v) for v in extents.split(","))
    ema_decay = float(opt_d.get("ema_decay", 0.999 if ema_sd else 0.0))

    train_cfg = VideoDiffusionConfig(
        decoder_model=cfg.decoder_model,
        image_size=cfg.image_size,
        n_past=s - 1,
        dim=dim,
        extents=tuple(extents),
        depth=depth,
        mlp_dim=mlp_dim,
        dim_head=inner // heads,
        heads=heads,
        ema_decay=ema_decay if ema_sd else 0.0,
        name=str(opt_d.get("name", "imported")),
        output_dir=cfg.output_dir,
    )

    # validation: apply() rejects any tree/shape mismatch
    model = make_model(train_cfg, (s, h, w), num_classes)
    to_j = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
    params = to_j(params)
    ema = to_j(ema)
    logits = model.apply(
        {"params": params}, jnp.zeros((1, s, h, w), jnp.int32)
    )
    assert logits.shape == (1, h, w, num_classes), logits.shape
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
        f"{depth}, grid {s}x{h}x{w}, {num_classes} classes"
        f"{', +ema' if ema_sd else ''}) -> {path}"
    )
    return path


def main(argv=None):
    run(dataclass_cli(ImportTorchVideoConfig, argv))


if __name__ == "__main__":
    main()
