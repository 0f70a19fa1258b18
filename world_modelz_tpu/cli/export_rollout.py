"""Export a trained checkpoint as a self-contained serving artifact.

    python -m world_modelz_tpu.cli.export_rollout \
        --checkpoint outputs/r3_m3f16/step_0075000 --use_ema true \
        --out artifacts/m3f16_serve

The artifact (world_modelz_tpu/aot.py) holds serialized StableHLO for
the encode + rollout programs at every ladder batch size plus one copy
of the weights; `serve_http --exported <dir>` then serves it without the
checkpoint or any model code. The reference's only deployment path is
re-running main2.py --eval per clip (minecraft/main2.py:59-131).
"""

from __future__ import annotations

import dataclasses

import jax

from world_modelz_tpu.cli.train_vqae import load_tokenizer
from world_modelz_tpu.cli.video_diffusion import (
    VideoDiffusionConfig,
    make_model,
)
from world_modelz_tpu.train.checkpoint import restore_checkpoint
from world_modelz_tpu.utils import dataclass_cli
from world_modelz_tpu.utils.config import config_from_dict


@dataclasses.dataclass
class ExportRolloutConfig:
    checkpoint: str = ""  # video-diffusion checkpoint (required)
    out: str = ""  # artifact directory (required)
    platform: str = ""
    use_ema: bool = False
    num_frames: int = 8  # generated frames per request
    num_iterations: int = 30  # unmask iterations (main2.py:81)
    topk: int = -1
    batch_size: int = 8  # ladder of power-of-two sizes up to this
    # lowering targets baked into the artifact (comma list)
    platforms: str = "tpu,cpu"


def run(cfg: ExportRolloutConfig):
    from world_modelz_tpu.aot import export_service

    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    if not cfg.checkpoint or not cfg.out:
        raise ValueError("--checkpoint and --out are required")

    state, step, config = restore_checkpoint(cfg.checkpoint)
    train_cfg = config_from_dict(VideoDiffusionConfig, config)
    params = (
        state["ema"] if cfg.use_ema and state.get("ema") else state["params"]
    )
    tok, tok_state, _ = load_tokenizer(train_cfg.decoder_model)
    th, tw = tok.token_grid_shape(
        (train_cfg.image_size, train_cfg.image_size)
    )
    token_shape = (train_cfg.n_past + 1, th, tw)
    model = make_model(train_cfg, token_shape, tok.num_embeddings)

    meta = export_service(
        cfg.out,
        tok,
        tok_state,
        model,
        params,
        num_frames=cfg.num_frames,
        num_iterations=cfg.num_iterations,
        sample_topk=cfg.topk,
        batch_size=cfg.batch_size,
        seed_frames=train_cfg.n_past + 1,
        image_size=train_cfg.image_size,
        channels=tok.in_channels,
        platforms=[p for p in cfg.platforms.split(",") if p],
    )
    print(
        f"exported step-{step} checkpoint -> {cfg.out} "
        f"(sizes {meta['sizes']}, platforms {meta['platforms']})"
    )
    return meta


def main(argv=None):
    run(dataclass_cli(ExportRolloutConfig, argv))


if __name__ == "__main__":
    main()
