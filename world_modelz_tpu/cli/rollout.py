"""Long-horizon autoregressive rollout from a trained diffusion checkpoint.

The standalone serving path (SURVEY.md §3.4): seed a context clip, generate
`num_frames` future frames by iterative unmasking (30 denoise iterations per
frame, main2.py:81), decode to pixels, and write per-frame PNGs + a GIF.
Equivalent to `main.py --eval` / `main2.py --eval` + make_gif.sh, as one
command.

The whole rollout (all frames x all denoise iterations x model forwards)
compiles to a single XLA program via scan/fori_loop — the reference
re-enters Python per iteration (main2.py:85-131).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from world_modelz_tpu.cli.train_vqae import load_tokenizer
from world_modelz_tpu.cli.video_diffusion import (
    VideoDiffusionConfig,
    build_clip_fn,
    make_model,
)
from world_modelz_tpu.diffusion import rollout_frames
from world_modelz_tpu.train.checkpoint import restore_checkpoint
from world_modelz_tpu.utils import (
    dataclass_cli,
    make_grid,
    save_gif,
    save_image,
)
from world_modelz_tpu.utils.config import config_from_dict


@dataclasses.dataclass
class RolloutConfig:
    checkpoint: str = ""  # video-diffusion checkpoint (required)
    platform: str = ""
    use_ema: bool = False
    shard_batch: bool = False  # data-parallel rollout over all devices
    batch_size: int = 4
    num_frames: int = 16
    num_eval_iterations: int = 30
    topk: int = -1
    manual_seed: int = 0
    output_dir: str = "outputs/rollout"
    name: str = "rollout"
    fps: float = 5.0


def run(cfg: RolloutConfig):
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    if not cfg.checkpoint:
        raise ValueError("--checkpoint (video-diffusion run) is required")

    state, step, config = restore_checkpoint(cfg.checkpoint)
    train_cfg = config_from_dict(VideoDiffusionConfig, config)
    params = state["ema"] if cfg.use_ema and state.get("ema") else state["params"]

    tok, tok_state, _ = load_tokenizer(train_cfg.decoder_model)
    clip_fn, sampler = build_clip_fn(train_cfg, cfg.manual_seed)
    frames = jnp.asarray(clip_fn(cfg.batch_size))
    b, s, hh, ww, c = frames.shape
    tokens = tok.encode(tok_state, frames.reshape(b * s, hh, ww, c))
    tokens = tokens.reshape(b, s, tokens.shape[1], tokens.shape[2])
    token_shape = (s, tokens.shape[2], tokens.shape[3])

    model = make_model(train_cfg, token_shape, tok.num_embeddings)
    logits_fn = lambda z: model.apply({"params": params}, z)

    if cfg.shard_batch:
        # data-parallel generation: shard the clip batch over all devices;
        # the scanned denoise loop shards with it under jit
        from world_modelz_tpu.parallel import batch_sharding, make_mesh, replicated

        mesh = make_mesh()
        if cfg.batch_size % mesh.shape["data"] != 0:
            raise ValueError(
                f"batch_size {cfg.batch_size} must be divisible by "
                f"{mesh.shape['data']} devices"
            )
        tokens = jax.device_put(tokens, batch_sharding(mesh))
        params = jax.device_put(params, replicated(mesh))

    gen = rollout_frames(
        jax.random.PRNGKey(cfg.manual_seed),
        logits_fn,
        tokens,
        num_frames=cfg.num_frames,
        num_classes=tok.num_embeddings,
        mask_token=tok.num_embeddings,
        num_iterations=cfg.num_eval_iterations,
        sample_topk=cfg.topk,
    )  # (B, T, h, w)
    t = gen.shape[1]
    decoded = tok.decode(tok_state, gen.reshape(b * t, *gen.shape[2:]))
    decoded = np.asarray(jax.device_get(decoded)).reshape(
        b, t, *decoded.shape[1:]
    )

    import os

    os.makedirs(cfg.output_dir, exist_ok=True)
    gif_frames = []
    for i in range(t):
        grid = make_grid(decoded[:, i], nrow=b)
        save_image(
            grid, f"{cfg.output_dir}/{cfg.name}_frame_{i:04d}.png"
        )
        gif_frames.append(grid)
    gif_path = f"{cfg.output_dir}/{cfg.name}.gif"
    save_gif(gif_frames, gif_path, fps=cfg.fps)
    print(f"rollout: {t} frames -> {gif_path}")
    if sampler is not None:
        sampler.close()
    return decoded


def main(argv=None):
    run(dataclass_cli(RolloutConfig, argv))


if __name__ == "__main__":
    main()
