"""Masked video-diffusion training CLI (next-frame prediction).

Parity with vq-video-diffusion/main.py (MovingMNIST) and minecraft/main2.py
(trajectory data) in one module — the reference files are near-identical
copies differing only in the data source:
- frozen VQ tokenizer loaded from a checkpoint's embedded config
  (main2.py:390-396)
- loss-aware diffusion-time sampling + masked corruption of the last frame
  (main2.py:251-264)
- Local3dAttentionTransformer denoiser, CE loss on the last frame
  (main2.py:271-279)
- warmup+cosine schedule, optional model EMA, gradient accumulation
- periodic eval: iterative-unmask autoregressive rollout decoded to pixel
  frames, saved as PNG grid + GIF (main2.py:316-338; make_gif.sh)
- checkpoints bundle params/EMA/optimizer/sampler + config (main2.py:302-314)

TPU-first: tokenization, corruption, denoiser fwd/bwd, optimizer, EMA and
the sampler histogram update run in ONE jitted global-view step over the
('data','model') mesh — the reference's per-step host syncs (grad-norm
Python loop, sampler .cpu() update, SURVEY.md §3.2) are gone.
"""

from __future__ import annotations

import dataclasses
import os
import time
from collections import deque
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from world_modelz_tpu.cli.train_vqae import load_tokenizer
from world_modelz_tpu.data import (
    BufferedTrajectorySampler,
    MovingMNIST,
    PrefetchIterator,
    SyntheticTrajectorySource,
)
from world_modelz_tpu.data.device_composite import as_frames
from world_modelz_tpu.diffusion import corrupt_tokens, rollout_frames
from world_modelz_tpu.models.video import VqVideoDiffusionModel
from world_modelz_tpu.parallel import (
    DEFAULT_TP_RULES,
    batch_sharding,
    clip_sharding,
    fsdp_shardings,
    make_mesh,
    opt_state_shardings,
    replicated,
    shard_params,
)
from world_modelz_tpu.train import (
    CheckpointGuard,
    ema_init,
    ema_update,
    loss_aware_init,
    loss_aware_sample,
    loss_aware_update,
    loss_aware_weights,
    host_schedule,
    make_optimizer,
    warmup_cosine_schedule,
)
from world_modelz_tpu.train.checkpoint import (
    AsyncCheckpointSaver,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from world_modelz_tpu.train.timing import TrainTiming, fence_value
from world_modelz_tpu.utils import (
    MetricLogger,
    dataclass_cli,
    make_grid,
    save_gif,
    save_image,
)
from world_modelz_tpu.utils.config import config_to_dict


@dataclasses.dataclass
class VideoDiffusionConfig:
    """Flags mirror minecraft/main2.py:149-197."""

    manual_seed: int = 42
    platform: str = ""  # "", "cpu", "tpu" — the reference's --device flag
    lr: float = 1e-4
    batch_size: int = 10
    optimizer: str = "AdamW"
    weight_decay: float = 1e-7
    ema_decay: float = 0.0
    bf16: bool = False  # bfloat16 compute with f32 master weights
    nan_guard: bool = True  # reject steps with non-finite loss/grads

    dataset: str = "moving_mnist"  # moving_mnist|synthetic|minerl|video
    # ship sprite trajectories (~1 KB/clip) instead of pixel clips and
    # composite frames inside the jitted step (data/device_composite.py):
    # removes the dominant host->device relay transfer (moving_mnist,
    # native pipeline only)
    device_composite: bool = False
    # "native" = the in-repo samplers; "grain" = deterministic,
    # checkpointable Grain DataLoader (moving_mnist only; see
    # data/grain_pipeline.py)
    data_pipeline: str = "native"
    data_workers: int = 0  # grain worker processes (0 = in-process)
    data_dir: str = ""
    image_size: int = 64
    n_past: int = 5
    num_digits: int = 2
    digit_size: int = 24
    decoder_model: str = ""  # tokenizer checkpoint path (required)
    # run the FROZEN tokenizer (per-step encode in step_body, eval decode)
    # in bfloat16: the encoder is pure inference on a frozen model, and
    # the compiled full-step twin (train_step/m3_b64_g8_full) measures the
    # f32 encode at ~2 ms/step of the b64 budget; the tokenize/* ledger
    # rows bench bf16 states as the standard. f32 available for A/B.
    tok_bf16: bool = True

    max_steps: int = 200_000
    warmup: int = 500
    accumulation_steps: int = 1
    # fuse k optimizer steps into ONE compiled program (lax.scan over k
    # stacked batches): host/RPC dispatch overhead amortizes by k — the
    # main lever for the compiled-vs-wall steps/sec gap on relay-attached
    # TPUs (train_e2e ledger row). Dispatches never cross a log/eval/
    # checkpoint/histogram boundary, so any interval values remain exact;
    # uneven boundaries just compile one extra (shorter) program shape.
    steps_per_dispatch: int = 1
    checkpoint_interval: int = 25_000
    eval_interval: int = 2000
    eval_timesteps: int = 4
    eval_batch_size: int = 8
    num_eval_iterations: int = 30
    p_max_uniform: float = 0.1
    log_interval: int = 10
    # "deferred": log points enqueue their scalar readbacks and read the
    # PREVIOUS log point's (already-computed) values, so the device always
    # has a dispatch in flight — the synchronous mode drains the device
    # and idles it through 2-3 relay RPC roundtrips + logging every log
    # point (measured 15.9% of trainer wall at log_interval=10). "sync"
    # restores the strict read-at-own-step behavior.
    log_fence: str = "deferred"
    histogram_interval: int = 50  # sampler-weight histograms (main2.py:298)
    # write an end-to-end timing breakdown JSON on exit (ledger section
    # train_e2e ingests it): steps/sec over the post-warmup window between
    # log-point value readbacks, host time shares (data / dispatch /
    # device_wait / log / checkpoint / eval), fenced device-step and h2d
    # transfer probes, and a reconciliation of wall = device + host
    # (train/timing.py). Honest on relay backends: window endpoints are
    # value readbacks, never enqueue fences.
    timing_report: str = ""
    # every Nth step (timing_report only) isolate one dispatch behind
    # value fences to measure true device ms/step inside the run; 0 = off
    probe_interval: int = 200

    dim: int = 256
    extents: Tuple[int, int, int] = (3, 3, 3)
    depth: int = 4
    mlp_dim: int = 256
    dim_head: int = 128
    heads: int = 1
    dropout: float = 0.0

    buffer_size: int = 100_000
    skip_frames: int = 2

    n_model: int = 1
    n_seq: int = 1  # sequence-parallel shards of the frame axis
    # ZeRO/FSDP: shard params + EMA + optimizer moments over the 'data'
    # axis (parallel/fsdp.py); composes with --n_model tensor parallelism
    fsdp: bool = False
    wandb: bool = False
    project: str = "vq-video-diffusion"
    tags: str = ""
    name: str = "vq_diffusion"
    output_dir: str = "outputs/video_diffusion"
    checkpoint: str = ""
    # weights-only warm start: load params/EMA but keep a fresh optimizer/
    # sampler and step 0 — for fine-tuning, or checkpoints without
    # optimizer state (e.g. imported reference models,
    # cli/import_torch_video.py)
    init_from: str = ""
    eval: bool = False
    topk: int = -1


def build_clip_fn(cfg: VideoDiffusionConfig, seed: int):
    """Host source of (B, n_past+1, H, W, C) float32 clips."""
    rng = np.random.default_rng(seed)
    if cfg.dataset == "moving_mnist":
        ds = MovingMNIST(
            data_root=cfg.data_dir or None,
            seq_len=cfg.n_past + 1,
            image_size=cfg.image_size,
            num_digits=cfg.num_digits,
            digit_size=cfg.digit_size,
            deterministic=False,
        )
        if cfg.data_pipeline == "grain":
            # deterministic, checkpointable record stream (the torch
            # DataLoader analog the reference uses, minus its lost-on-
            # restart shuffle state); see data/grain_pipeline.py
            from world_modelz_tpu.data.grain_pipeline import (
                GrainClipPipeline,
            )

            pipe = GrainClipPipeline(
                ds, cfg.batch_size, seed=seed,
                worker_count=cfg.data_workers,
            )
            return lambda b: pipe.sample_batch(b), pipe
        if cfg.device_composite:
            # trajectory shipping; step_body / evaluate_and_save composite
            # on device (see data/device_composite.py)
            return lambda b: ds.sample_batch_traj(rng, b), None
        # uint8-native shipping; step_body / evaluate_and_save normalize
        # on device (4x less relay traffic than float32 clips)
        return lambda b: ds.sample_batch_u8(rng, b), None
    if cfg.dataset in ("synthetic", "minerl", "video"):
        if cfg.dataset == "minerl":
            from world_modelz_tpu.data.trajectory import MineRLTrajectorySource

            src = MineRLTrajectorySource(
                ["MineRLTreechop-v0"], cfg.data_dir
            )
        elif cfg.dataset == "video":
            from world_modelz_tpu.data.trajectory import (
                VideoFileTrajectorySource,
            )

            src = VideoFileTrajectorySource(
                cfg.data_dir, frame_size=cfg.image_size
            )
        else:
            src = SyntheticTrajectorySource(frame_size=cfg.image_size)
        if cfg.data_pipeline == "grain":
            # deterministic random-access clip view over the trajectory
            # source (data/trajectory.py TrajectoryClipDataset): resumes
            # exactly, shards across hosts, unlike the thread sampler
            from world_modelz_tpu.data.grain_pipeline import (
                GrainClipPipeline,
            )
            from world_modelz_tpu.data.trajectory import (
                TrajectoryClipDataset,
            )

            ds = TrajectoryClipDataset(
                src, traj_len=cfg.n_past + 1,
                skip_frames=cfg.skip_frames, seed=seed,
            )
            pipe = GrainClipPipeline(
                ds, cfg.batch_size, seed=seed,
                worker_count=cfg.data_workers,
            )
            # uint8 clips; as_frames normalizes on device
            return lambda b: pipe.sample_batch(b), pipe
        sampler = BufferedTrajectorySampler(
            src,
            buffer_size=cfg.buffer_size,
            traj_len=cfg.n_past + 1,
            skip_frames=cfg.skip_frames,
            seed=seed,
        )
        return (
            lambda b: sampler.sample_batch(b).astype(np.float32) / 255.0,
            sampler,
        )
    raise ValueError(f"unknown dataset {cfg.dataset!r}")


def make_model(
    cfg: VideoDiffusionConfig,
    token_shape: Tuple[int, int, int],
    num_embeddings: int,
    mesh=None,
) -> VqVideoDiffusionModel:
    """With `mesh` given and cfg.n_seq > 1, the frame axis of the attention
    stack is sharded over the mesh's 'seq' axis (context parallelism)."""
    seq = mesh is not None and cfg.n_seq > 1
    return VqVideoDiffusionModel(
        data_shape=token_shape,
        dim=cfg.dim,
        num_classes=num_embeddings,
        extents=tuple(cfg.extents),
        depth=cfg.depth,
        mlp_dim=cfg.mlp_dim,
        dim_head=cfg.dim_head,
        heads=cfg.heads,
        dropout=cfg.dropout,
        seq_axis="seq" if seq else "",
        seq_mesh=mesh if seq else None,
    )


def evaluate_and_save(
    *,
    cfg: VideoDiffusionConfig,
    model,
    params,
    tok,
    tok_state,
    clip_fn,
    key,
    tag: str,
    step: int,
    logger: Optional[MetricLogger] = None,
    save_frames: bool = False,
):
    """Autoregressive rollout + decode + artifact writing
    (main2.py:59-146)."""
    frames = as_frames(clip_fn(cfg.eval_batch_size), cfg.image_size)
    b, s, hh, ww, c = frames.shape
    tokens = tok.encode(
        tok_state, frames.reshape(b * s, hh, ww, c)
    )
    tokens = tokens.reshape(b, s, tokens.shape[1], tokens.shape[2])

    logits_fn = lambda z: model.apply({"params": params}, z)
    gen_tokens = rollout_frames(
        key,
        logits_fn,
        tokens,
        num_frames=cfg.eval_timesteps,
        num_classes=tok.num_embeddings,
        mask_token=tok.num_embeddings,
        num_iterations=cfg.num_eval_iterations,
        sample_topk=cfg.topk,
    )  # (B, T, h, w)
    t = gen_tokens.shape[1]
    decoded = tok.decode(
        tok_state, gen_tokens.reshape(b * t, *gen_tokens.shape[2:])
    )
    # float32 on the host boundary: a bf16 tokenizer (--tok_bf16) returns
    # bf16 pixels, which numpy image utils must not mix-promote
    decoded = (
        np.asarray(jax.device_get(decoded))
        .astype(np.float32)
        .reshape(b, t, *decoded.shape[1:])
    )
    seed_frame = np.asarray(jax.device_get(frames[:, -1])).astype(np.float32)

    # layout mirrors eval_model_and_save: one row per timestep, batch across
    all_frames = np.concatenate([seed_frame[:, None], decoded], axis=1)
    grid = make_grid(
        all_frames.transpose(1, 0, 2, 3, 4).reshape(
            -1, *all_frames.shape[2:]
        ),
        nrow=b,
    )
    fn = f"{cfg.output_dir}/{cfg.name}_eval_{step:07d}_{tag}.png"
    save_image(grid, fn)
    gif_frames = [make_grid(all_frames[:, i], nrow=b) for i in range(t + 1)]
    save_gif(gif_frames, fn.replace(".png", ".gif"), fps=4)
    if save_frames:
        for i in range(t + 1):
            save_image(
                make_grid(all_frames[:, i], nrow=b),
                f"{cfg.output_dir}/{cfg.name}_{tag}_frame_{i:04d}.png",
            )
    if logger is not None:
        logger.log_image(step, f"reconstruction_{tag}", grid)
    print("eval artifact:", fn)
    return fn


def train(cfg: VideoDiffusionConfig):
    from world_modelz_tpu.utils import compcache

    compcache.enable()  # skip repeat relay compiles (1-4 min each)

    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    if not cfg.decoder_model:
        raise ValueError("--decoder_model (tokenizer checkpoint) is required")
    if cfg.device_composite and (
        cfg.dataset != "moving_mnist" or cfg.data_pipeline != "native"
    ):
        raise ValueError(
            "--device_composite needs the procedural moving_mnist source "
            "on the native pipeline (trajectories are a moving_mnist "
            "concept; grain batches are pixel records)"
        )
    mesh = make_mesh(n_model=cfg.n_model, n_seq=cfg.n_seq)
    n_data = mesh.shape["data"]
    if cfg.batch_size % n_data != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} must be divisible by the "
            f"data-parallel axis ({n_data} devices)"
        )
    if cfg.n_seq > 1:
        clip_len = cfg.n_past + 1
        if clip_len % cfg.n_seq != 0:
            raise ValueError(
                f"n_past+1 ({clip_len} frames) must be divisible by "
                f"n_seq ({cfg.n_seq})"
            )
        if clip_len // cfg.n_seq < cfg.extents[0]:
            raise ValueError(
                f"sequence shards of {clip_len // cfg.n_seq} frames are "
                f"shorter than the temporal extent {cfg.extents[0]}; "
                "use fewer sequence shards"
            )

    tok, tok_state, tok_cfg = load_tokenizer(cfg.decoder_model)
    if cfg.tok_bf16:
        # frozen-tokenizer inference dtype (see VideoDiffusionConfig);
        # keeps the VQ codebook f32 so token assignments match the f32
        # rollout/eval path exactly (models/tokenizer.py)
        from world_modelz_tpu.models.tokenizer import tokenizer_inference_cast

        tok_state = tokenizer_inference_cast(tok_state)
    num_embeddings = tok.num_embeddings
    mask_token = num_embeddings

    clip_fn, sampler = build_clip_fn(cfg, cfg.manual_seed)
    # eval draws from its own stream: the train stream is owned by the
    # prefetch worker thread once training starts (a shared Grain iterator
    # would race it, and eval pulls would perturb the checkpointed record
    # position). The procedural moving_mnist source is cheap to duplicate;
    # the buffered trajectory samplers are thread-safe and heavyweight, so
    # those keep sharing the train stream.
    if cfg.dataset == "moving_mnist" or cfg.data_pipeline == "grain":
        eval_clip_fn, _ = build_clip_fn(cfg, cfg.manual_seed + 101)
    else:
        eval_clip_fn = clip_fn

    # probe token-grid shape from one encoded clip (main2.py:399-404)
    probe = as_frames(clip_fn(1), cfg.image_size)
    _, s, hh, ww, c = probe.shape
    if c != tok.in_channels:
        raise ValueError(
            f"data has {c} channels but the tokenizer was trained with "
            f"in_channels={tok.in_channels} (check --decoder_model vs "
            "--dataset)"
        )
    z = tok.encode(tok_state, probe[0])
    token_shape = (s, z.shape[1], z.shape[2])
    print("token grid:", token_shape)

    model = make_model(cfg, token_shape, num_embeddings, mesh=mesh)
    # init + eval/rollout use the plain (unsharded) module: identical params,
    # no shard_map batch-divisibility constraints on tiny batches
    eval_model = make_model(cfg, token_shape, num_embeddings)
    key = jax.random.PRNGKey(cfg.manual_seed)
    params = eval_model.init(
        key, jnp.zeros((1,) + token_shape, jnp.int32)
    )["params"]
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"parameters: {n_params:,}")

    schedule = warmup_cosine_schedule(cfg.lr, cfg.warmup, cfg.max_steps)
    lr_of = host_schedule(schedule)  # log-point lr reads: no device RPC
    opt = make_optimizer(cfg.optimizer, schedule, cfg.weight_decay)
    if cfg.accumulation_steps > 1:
        opt = optax.MultiSteps(opt, cfg.accumulation_steps)
    opt_state = opt.init(params)
    ema_params = ema_init(params) if cfg.ema_decay > 0 else None
    sampler_state = loss_aware_init()

    start_step = 0
    if cfg.checkpoint and cfg.init_from:
        raise ValueError("--checkpoint (full resume) and --init_from "
                         "(weights-only) are mutually exclusive")
    if cfg.init_from and not cfg.eval:
        restored, at_step, _ = restore_checkpoint(cfg.init_from)
        params = restored["params"]
        opt_state = opt.init(params)
        if cfg.ema_decay > 0:
            ema_params = (
                restored["ema"] if restored.get("ema") else ema_init(params)
            )
        print(f"warm start from {cfg.init_from} (step {at_step} weights; "
              "fresh optimizer, step 0)")
    if cfg.checkpoint:
        if cfg.eval:
            # eval-only: weights suffice; don't demand optimizer-state
            # compatibility (e.g. a checkpoint trained with a different
            # accumulation_steps has a MultiSteps-shaped opt_state)
            restored, start_step, _ = restore_checkpoint(cfg.checkpoint)
            params = restored["params"]
            if cfg.ema_decay > 0 and restored.get("ema"):
                ema_params = restored["ema"]
        else:
            target = {
                "params": params,
                "ema": ema_params if ema_params is not None else {},
                "opt_state": opt_state,
                "sampler": sampler_state,
            }
            restored, start_step, _ = restore_checkpoint(
                cfg.checkpoint, target
            )
            params = restored["params"]
            ema_params = restored["ema"] if cfg.ema_decay > 0 else None
            opt_state = restored["opt_state"]
            sampler_state = restored["sampler"]
        if sampler is not None and hasattr(sampler, "set_state"):
            gs = os.path.join(cfg.checkpoint, "grain_state.json")
            if os.path.exists(gs):
                with open(gs, "rb") as f:
                    sampler.set_state(f.read())
                print("input pipeline resumed from", gs)
        print(f"resumed from {cfg.checkpoint} at step {start_step}")

    # shard: params/opt replicated, tensor-parallel, or FSDP (params +
    # EMA + optimizer moments split over 'data'); batch over 'data'
    repl = replicated(mesh)
    if cfg.fsdp:
        p_shard = fsdp_shardings(params, mesh, DEFAULT_TP_RULES)
        opt_shard = opt_state_shardings(opt_state, params, p_shard, mesh)
    else:
        p_shard = shard_params(params, mesh, DEFAULT_TP_RULES)
        opt_shard = repl
    params = jax.device_put(params, p_shard)
    if not cfg.eval:
        opt_state = jax.device_put(opt_state, opt_shard)
    tok_state = jax.device_put(tok_state, repl)
    sampler_state = jax.device_put(sampler_state, repl)
    if ema_params is not None:
        ema_params = jax.device_put(ema_params, p_shard)

    if cfg.eval:
        evaluate_and_save(
            cfg=cfg, model=eval_model, params=params, tok=tok,
            tok_state=tok_state, clip_fn=clip_fn, key=key, tag="base",
            step=start_step, save_frames=True,
        )
        if sampler is not None:
            sampler.close()
        return params

    def step_body(carry, inp):
        """One optimizer step as a scan body so k of them can ride a
        single compiled program (steps_per_dispatch)."""
        params, ema_params, opt_state, sampler_state = carry
        frames, key = inp
        # uint8 pixels are normalized, sprite trajectories composited, on
        # device — the host ships the smallest representation it has
        frames = as_frames(frames, cfg.image_size)
        b, s, hh, ww, c = frames.shape
        k_r, k_corrupt, k_drop = jax.random.split(key, 3)

        tokens = tok.encode(tok_state, frames.reshape(b * s, hh, ww, c))
        tokens = tokens.reshape(b, s, tokens.shape[1], tokens.shape[2])
        target = tokens[:, -1]

        r = loss_aware_sample(sampler_state, k_r, b)
        corrupted, _ = corrupt_tokens(
            k_corrupt,
            target.reshape(b, -1),
            r,
            num_classes=num_embeddings,
            mask_token=mask_token,
            p_max_uniform=cfg.p_max_uniform,
        )
        batch_z = tokens.at[:, -1].set(corrupted.reshape(target.shape))

        def loss_fn(p):
            if cfg.bf16:
                p = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32
                    else x,
                    p,
                )
            logits = model.apply(
                {"params": p},
                batch_z,
                train=True,
                rngs={"dropout": k_drop},
            )
            logits = logits.astype(jnp.float32)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, num_embeddings), target.reshape(-1)
            )
            return ce.mean(), ce.reshape(b, -1).mean(axis=1)

        (loss, per_sample), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        gn = optax.global_norm(grads)

        old = (params, ema_params, opt_state, sampler_state)
        per_sample = jnp.nan_to_num(per_sample)
        sampler_state = loss_aware_update(sampler_state, r, per_sample)
        grads = jax.tree_util.tree_map(jnp.nan_to_num, grads)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_params is not None:
            ema_params = ema_update(ema_params, params, cfg.ema_decay)

        # failure detection: on a non-finite loss/grad the whole step is
        # rejected — params, EMA, optimizer and sampler stay untouched
        # (train/guard.py semantics, automated vs the reference's manual
        # restarts)
        ok = jnp.isfinite(loss) & jnp.isfinite(gn)
        if cfg.nan_guard:
            from world_modelz_tpu.train.guard import reject_nonfinite

            new = (params, ema_params, opt_state, sampler_state)
            params, ema_params, opt_state, sampler_state = reject_nonfinite(
                ok, old, new
            )
        return (params, ema_params, opt_state, sampler_state), (loss, gn, ok)

    def _pack_stats(loss, gn, ok):
        """One small device array per dispatch: (loss, grad_norm, ok).
        The host logger reads it back with a SINGLE value fetch — three
        separate float()/bool() reads cost three relay roundtrips each
        log point, which dominated the wall-vs-compiled gap at short
        (~23 ms) steps."""
        return jnp.stack(
            [loss.astype(jnp.float32), gn.astype(jnp.float32),
             ok.astype(jnp.float32)]
        )

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def train_step(params, ema_params, opt_state, sampler_state, frames, key):
        carry, (loss, gn, ok) = step_body(
            (params, ema_params, opt_state, sampler_state), (frames, key)
        )
        return (*carry, _pack_stats(loss, gn, ok))

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def train_kstep(
        params, ema_params, opt_state, sampler_state, frame_list, keys
    ):
        """n fused optimizer steps: scan `step_body` over n batches inside
        one program. `frame_list` is a tuple of n (B, S, H, W, C) device
        arrays (stacked here, on device, so the per-batch host->device
        transfers still overlap compute); `keys` is (n, key). Returns the
        LAST substep's loss/grad-norm (that is the step the host logs) and
        the AND of the guard flags (any rejected substep surfaces)."""
        # frame_list entries are pixel arrays OR trajectory dicts; stack
        # leaf-wise so the scan carries either format
        frames_k = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *frame_list
        )
        carry, (losses, gns, oks) = jax.lax.scan(
            step_body,
            (params, ema_params, opt_state, sampler_state),
            (frames_k, keys),
        )
        return (*carry, _pack_stats(losses[-1], gns[-1], oks.all()))

    # trajectory sources are uint8-native: ship the raw bytes host->device
    # (4x less relay traffic than float32) and let step_body normalize on
    # device. moving_mnist/grain clip fns are float32-native and unchanged.
    train_batch_fn = (
        sampler.sample_batch
        if isinstance(sampler, BufferedTrajectorySampler)
        else clip_fn
    )
    batches = PrefetchIterator(
        lambda: train_batch_fn(cfg.batch_size),
        # fused dispatches (steps_per_dispatch) drain k batches at once;
        # keep the worker at least one full dispatch ahead
        depth=max(2, cfg.steps_per_dispatch + 1),
        # trajectory dicts have no frame axis to seq-shard; frames pick up
        # their seq sharding inside the jitted step after compositing
        sharding=batch_sharding(mesh)
        if cfg.device_composite
        else clip_sharding(mesh),
        # Grain position snapshots ride the queue with each batch so the
        # checkpoint sidecar records the CONSUMED position, not the
        # prefetched-ahead one (depth+1 batches would be skipped on resume)
        state_fn=(
            sampler.get_state
            if sampler is not None and hasattr(sampler, "get_state")
            else None
        ),
        # timing runs fence every ~2 dispatches' worth of batches to
        # measure the h2d transfer the async pipeline hides
        probe_every=(5 * max(1, cfg.steps_per_dispatch)
                     if cfg.timing_report else 0),
    )
    logger = MetricLogger(
        cfg.output_dir, cfg.name, use_wandb=cfg.wandb,
        project=cfg.project, config=config_to_dict(cfg), tags=cfg.tags,
    )
    saver = AsyncCheckpointSaver()

    def restore_latest():
        """Reload the newest on-disk checkpoint (guard escalation path)."""
        saver.wait()  # an in-flight async save must land first
        path = latest_checkpoint(cfg.output_dir) or cfg.checkpoint
        if not path:
            return None
        target = {
            "params": jax.device_get(params),
            "ema": jax.device_get(ema_params)
            if ema_params is not None
            else {},
            "opt_state": jax.device_get(opt_state),
            "sampler": jax.device_get(sampler_state),
        }
        restored, at_step, _ = restore_checkpoint(path, target)
        print(f"[guard] restored {path} (step {at_step})")
        return (
            jax.device_put(restored["params"], p_shard),
            jax.device_put(restored["ema"], p_shard)
            if ema_params is not None
            else None,
            jax.device_put(restored["opt_state"], opt_shard),
            jax.device_put(restored["sampler"], repl),
        )

    guard = CheckpointGuard(restore_latest)
    t0 = time.time()
    rejected = 0
    # Deferred log readback (cfg.log_fence="deferred"): at a log point the
    # host ENQUEUES the readback (pushes the device scalars on a small
    # queue) and reads the PREVIOUS log point's values instead — those are
    # long computed, so the read returns immediately and the device always
    # has the next dispatch in flight. With the synchronous mode the device
    # drains and then idles through the guard check, 2-3 value-readback RPC
    # roundtrips, logging and the next batch fetch at every log point
    # (measured 15.9% of wall at log_interval=10 on the relay). Timing
    # windows stay honest: they open and close on explicit value fences
    # (a drain of the queue), never on deferred reads.
    pending = deque()  # (step, packed (loss, gn, ok), host_steps_per_sec)

    # end-to-end timing (cfg.timing_report): host buckets, a fenced
    # steps/sec window, device/h2d probes and a wall-time reconciliation
    # (train/timing.py)
    tm = TrainTiming(
        probe_interval=cfg.probe_interval if cfg.timing_report else 0
    )

    def flush_log_entry(entry):
        """Read back and log one enqueued log point (a value fence for the
        dispatch that produced it). Returns the guard's restore tuple when
        NaN escalation fired, else None. The value reads are charged to
        the device_wait bucket (they block on device compute when enqueue
        runs ahead); pure host logging is charged to log."""
        nonlocal rejected
        estep, stats_e, sps = entry
        tt = time.perf_counter()
        # the guard acts on-device every step; the host only samples the
        # flag at log points to avoid a per-step readback sync. ONE value
        # fetch for the packed (loss, gn, ok) array: each separate
        # float()/bool() read is a full relay roundtrip
        vals = np.asarray(stats_e)
        loss_v, gn_v, ok_v = float(vals[0]), float(vals[1]), bool(vals[2] > 0.5)
        tt2 = time.perf_counter()
        tm.add("device_wait", tt2 - tt)
        accepted = ok_v or not cfg.nan_guard
        if not accepted:
            rejected += 1
            print(f"{estep}: step REJECTED (non-finite loss/grads)")
        restored = guard.record(accepted, estep)
        m = {
            "loss": loss_v,
            "grad_norm": gn_v,
            "lr": lr_of(estep),
            "steps_per_sec": sps,
        }
        logger.log(estep, **m)
        print(
            f"{estep}: loss {m['loss']:.3e} lr {m['lr']:.3e} "
            f"grad_norm {m['grad_norm']:.3e}"
        )
        tm.add("log", time.perf_counter() - tt2)
        return restored

    kdisp = max(1, cfg.steps_per_dispatch)
    seen_sizes = set()  # dispatch lengths already compiled+run

    def dispatch_len(done: int) -> int:
        """Steps to fuse into the next program: up to `kdisp`, but never
        crossing the next log/histogram/checkpoint/eval/probe/max_steps
        boundary (host-side work happens at exact step multiples, as with
        k=1)."""
        stop = cfg.max_steps
        first_log = start_step + 1  # compile/warmup log point
        if done < first_log:
            stop = min(stop, first_log)
        for iv in (cfg.log_interval, cfg.histogram_interval,
                   cfg.checkpoint_interval, cfg.eval_interval,
                   tm.probe_interval):
            if iv:
                stop = min(stop, (done // iv + 1) * iv)
        return max(1, min(kdisp, stop - done))

    try:
        step = start_step
        stats = None  # packed (loss, gn, ok) of the most recent dispatch
        while step < cfg.max_steps:
            n = dispatch_len(step)
            tt = time.perf_counter()
            frame_list = [next(batches) for _ in range(n)]
            tm.add("data", time.perf_counter() - tt)
            keys = jax.random.split(key, n + 1)
            key = keys[0]
            # device probe: isolate this dispatch behind value fences to
            # measure true device ms/step inside the run (only at the
            # steady-state compiled size, never timing a fresh compile)
            probe = tm.probe_due(step + n) and tm.opened and n in seen_sizes
            if probe:
                tp = time.perf_counter()
                fence_value(stats)  # device idle behind the last dispatch
                # this dispatch's inputs have landed (last-shipped leaf)
                leaves = jax.tree_util.tree_leaves(frame_list)
                fence_value(leaves[-1] if leaves else None)
                td = time.perf_counter()
            else:
                tt = time.perf_counter()
            if n == 1:
                (params, ema_params, opt_state, sampler_state,
                 stats) = train_step(
                    params, ema_params, opt_state, sampler_state,
                    frame_list[0], keys[1],
                )
            else:
                (params, ema_params, opt_state, sampler_state,
                 stats) = train_kstep(
                    params, ema_params, opt_state, sampler_state,
                    tuple(frame_list), keys[1:],
                )
            step += n
            seen_sizes.add(n)
            if probe:
                fence_value(stats)
                now = time.perf_counter()
                tm.record_probe(n, now - td)
                tm.add("probe", now - tp)
            else:
                tm.add("dispatch", time.perf_counter() - tt)
            if step % cfg.log_interval == 0 or step == start_step + 1:
                dt = time.time() - t0
                t0 = time.time()
                pending.append(
                    (step, stats, cfg.log_interval / max(dt, 1e-9))
                )
                deferred = cfg.log_fence == "deferred"
                # window: from the 2nd log point (warmup/compile excluded)
                # to the latest fence
                opened = not tm.opened and step > start_step + 1
                # with fused dispatch the steady-state k-step program only
                # compiles at the first full-k dispatch (after the second
                # log point); opening the window before then averages a
                # 1-4 min relay compile into the steps/sec
                if opened and kdisp > 1 and kdisp not in seen_sizes:
                    opened = False
                # a window EDGE must be a value fence; in deferred mode
                # that means draining the whole queue at the opening point
                # (intermediate points keep one entry in flight and are
                # not fences; the close fence is the end-of-run drain)
                fence = (not deferred) or opened
                while len(pending) > (0 if fence else 1):
                    restored = flush_log_entry(pending.popleft())
                    if restored is not None:
                        params, ema_params, opt_state, sampler_state = (
                            restored
                        )
                now = time.perf_counter()
                if opened:
                    tm.open_window(step, now)
                elif tm.opened and fence:
                    tm.close_window(step, now)

            if cfg.histogram_interval and step % cfg.histogram_interval == 0:
                logger.log_histogram(
                    step,
                    "sampler_weights",
                    np.asarray(loss_aware_weights(sampler_state)),
                )

            if cfg.checkpoint_interval and step % cfg.checkpoint_interval == 0:
                tt = time.perf_counter()
                # input-pipeline position rides the checkpoint as a sidecar
                # (Grain state is JSON bytes); snapshot of the last CONSUMED
                # batch's position (taken in the prefetch worker, so it
                # never races the iterator), captured NOW so the background
                # write records the position as of this step; old
                # checkpoints without it restore fine
                grain_state = batches.consumed_state()
                # async: snapshot to fresh device buffers, write in the
                # background; the timer charges only the host-blocking part
                path = saver.save(
                    cfg.output_dir,
                    step,
                    {
                        "params": params,
                        "ema": ema_params if ema_params is not None else {},
                        "opt_state": opt_state,
                        "sampler": sampler_state,
                    },
                    config_to_dict(cfg),
                    extra_files=(
                        {"grain_state.json": grain_state}
                        if grain_state is not None
                        else None
                    ),
                )
                tm.add("checkpoint", time.perf_counter() - tt)
                print("checkpoint:", path)

            if cfg.eval_interval and step % cfg.eval_interval == 0:
                tt = time.perf_counter()
                evals = [("base", params)]
                if ema_params is not None:
                    evals.append(("ema", ema_params))
                for tag, p in evals:
                    key, sub = jax.random.split(key)
                    evaluate_and_save(
                        cfg=cfg, model=eval_model, params=p, tok=tok,
                        tok_state=tok_state, clip_fn=eval_clip_fn, key=sub,
                        tag=tag, step=step, logger=logger,
                    )
                tm.add("eval", time.perf_counter() - tt)
    finally:
        # deferred mode: drain the in-flight log entry — a value fence
        # that also closes the timing window honestly (the drain waits for
        # every dispatch up to the last log point to COMPUTE, so the
        # window includes that device time)
        try:
            last_step = pending[-1][0] if pending else None
            while pending:
                restored = flush_log_entry(pending.popleft())
                if restored is not None:
                    params, ema_params, opt_state, sampler_state = restored
            if (
                last_step is not None
                and tm.opened
                and last_step > tm.win["step"]
            ):
                tm.close_window(last_step, time.perf_counter())
        except Exception as e:  # device in a bad state: report what we have
            print("[log] deferred readback failed:", e)
        if cfg.timing_report:
            tm.write(
                cfg.timing_report,
                tm.report(
                    batch_size=cfg.batch_size,
                    extra={"token_shape": list(token_shape)},  # FLOPs grid
                    h2d_stats=batches.transfer_stats(),
                    config=config_to_dict(cfg),
                ),
            )
        try:
            saver.wait()  # the last async save must land before exit
        except Exception as e:
            print("[checkpoint] async save failed:", e)
        batches.close()
        logger.close()
        if sampler is not None:
            sampler.close()

    return params


def main(argv=None):
    cfg = dataclass_cli(VideoDiffusionConfig, argv)
    print("Config:", cfg)
    train(cfg)


if __name__ == "__main__":
    main()
