"""Serve a trained video-diffusion checkpoint over HTTP.

Production serving entry point: rehydrates the denoiser + tokenizer from a
checkpoint (embedded config, train_vqae.load_tokenizer contract), builds
the batched `RolloutService` (request coalescing, size ladder, streaming
sessions — serve.py) and exposes it through the stdlib HTTP front-end
(serve_http.py). The reference's nearest equivalent is re-running
`main2.py --eval` per clip (minecraft/main2.py:59-131); here concurrent
clients share one compiled program per batch.

    python -m world_modelz_tpu.cli.serve_http \
        --checkpoint outputs/r2_m3/step_0075000 --port 8000

    # client:
    from world_modelz_tpu.serve_http import http_generate
    video = http_generate("http://127.0.0.1:8000", seed_clip)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from world_modelz_tpu.cli.train_vqae import load_tokenizer
from world_modelz_tpu.cli.video_diffusion import (
    VideoDiffusionConfig,
    make_model,
)
from world_modelz_tpu.train.checkpoint import restore_checkpoint
from world_modelz_tpu.utils import dataclass_cli
from world_modelz_tpu.utils.config import config_from_dict


@dataclasses.dataclass
class ServeHTTPConfig:
    checkpoint: str = ""  # video-diffusion checkpoint (this or --exported)
    # AOT artifact dir (cli/export_rollout.py): serve WITHOUT the
    # checkpoint or model code; num_frames/iterations/topk come from the
    # artifact and the related flags below are ignored
    exported: str = ""
    platform: str = ""
    use_ema: bool = False
    host: str = "127.0.0.1"
    port: int = 8000
    # bearer auth for every route but /healthz (or WMZ_SERVE_TOKEN).
    # Tokens ride plaintext HTTP: front with a TLS-terminating proxy
    # before binding beyond localhost.
    auth_token: str = ""
    num_frames: int = 8  # generated frames per request
    num_iterations: int = 30  # unmask iterations per frame (main2.py:81)
    topk: int = -1
    # "fast" (10 iterations, topk 25 — swept-optimal, ~3x rollout
    # throughput at matched FVD/better PSNR) or "reference" (30, -1);
    # see cli/rollout.py SAMPLER_PRESETS. Empty = explicit flags above.
    preset: str = ""
    batch_size: int = 8  # max coalesced batch (power-of-two ladder below)
    max_wait_s: float = 0.05
    # serve lone requests immediately when the arrival rate cannot fill a
    # batch within max_wait_s anyway (serve.py adaptive_wait)
    adaptive_wait: bool = False
    manual_seed: int = 0


def build_service(cfg: ServeHTTPConfig):
    """Checkpoint or artifact -> ready RolloutService (CLI + tests)."""
    from world_modelz_tpu.serve import RolloutService

    # resolve the preset BEFORE the AOT branch: an exported program's
    # sampler iterations are frozen at export time, so --preset with
    # --exported would be silently ignored (and an unknown preset should
    # fail with the same friendly message cli/rollout gives)
    if cfg.preset:
        import dataclasses as _dc

        from world_modelz_tpu.cli.rollout import SAMPLER_PRESETS

        if cfg.preset not in SAMPLER_PRESETS:
            raise SystemExit(
                f"unknown --preset {cfg.preset!r}; "
                f"choose from {sorted(SAMPLER_PRESETS)}"
            )
        if cfg.exported:
            raise SystemExit(
                "--preset cannot be applied to --exported: the AOT "
                "program keeps the iterations it was exported with. "
                "Re-export with the preset's settings, or serve from "
                "--checkpoint."
            )
        p = SAMPLER_PRESETS[cfg.preset]
        cfg = _dc.replace(
            cfg, num_iterations=p["num_eval_iterations"], topk=p["topk"]
        )
        print(f"sampler preset {cfg.preset}: {cfg.num_iterations} "
              f"iterations, topk {cfg.topk}")

    if cfg.exported:
        from world_modelz_tpu.aot import AOTPrograms

        progs = AOTPrograms.load(cfg.exported)
        svc = RolloutService(
            programs=progs,
            batch_size=min(cfg.batch_size, max(progs.sizes)),
            max_wait_s=cfg.max_wait_s,
            adaptive_wait=cfg.adaptive_wait,
            seed=cfg.manual_seed,
        )
        return svc, f"aot:{cfg.exported}"
    state, step, config = restore_checkpoint(cfg.checkpoint)
    train_cfg = config_from_dict(VideoDiffusionConfig, config)
    params = (
        state["ema"] if cfg.use_ema and state.get("ema") else state["params"]
    )
    tok, tok_state, _ = load_tokenizer(train_cfg.decoder_model)

    th, tw = tok.token_grid_shape((train_cfg.image_size, train_cfg.image_size))
    token_shape = (train_cfg.n_past + 1, th, tw)
    model = make_model(train_cfg, token_shape, tok.num_embeddings)

    svc = RolloutService(
        tok, tok_state, model, params,
        num_frames=cfg.num_frames,
        num_iterations=cfg.num_iterations,
        sample_topk=cfg.topk,
        batch_size=cfg.batch_size,
        max_wait_s=cfg.max_wait_s,
        adaptive_wait=cfg.adaptive_wait,
        seed=cfg.manual_seed,
    )
    return svc, step


def run(cfg: ServeHTTPConfig):
    from world_modelz_tpu.serve_http import RolloutHTTPServer

    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    if not cfg.checkpoint and not cfg.exported:
        raise ValueError(
            "--checkpoint (video-diffusion run) or --exported (AOT "
            "artifact) is required"
        )

    svc, step = build_service(cfg)
    import os

    token = cfg.auth_token or os.environ.get("WMZ_SERVE_TOKEN", "")
    server = RolloutHTTPServer(
        svc, host=cfg.host, port=cfg.port, auth_token=token
    )
    print(
        f"serving step-{step} checkpoint on http://{cfg.host}:{server.port} "
        f"(batch<= {cfg.batch_size}, {cfg.num_frames} frames/request, "
        f"backend {jax.default_backend()})"
    )
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.shutdown()
        svc.close()


def main(argv=None):
    run(dataclass_cli(ServeHTTPConfig, argv))


if __name__ == "__main__":
    main()
