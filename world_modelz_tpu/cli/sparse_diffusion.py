"""Sparse space-time diffusion training CLI.

Parity with minecraft/sparse_diffusion.py:272-543: train a dense transformer
denoiser on random `num_context`-token subsets of (S, H, W) token volumes —
positions drawn by time-dependent temporal windows ("neighbors") or
uniformly — with amortized tokenization (a fresh trajectory batch is encoded
only every `change_batch_interval` steps, :412-425), loss-aware or uniform
diffusion-time sampling, EMA, warmup+cosine, and sparse chunked-sweep
evaluation with scatter write-back (:139-202).

TPU-first: position sampling (per-row randperm in the reference, :69-72) is
the fixed-shape argsort formulation from `diffusion/sparse.py`; the whole
train step — gather, corruption, transformer, CE, sampler update, optimizer,
EMA — is one jitted global-view program over the ('data','model') mesh.
"""

from __future__ import annotations

import dataclasses
import os
import time
from collections import deque
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from world_modelz_tpu.cli.train_vqae import load_tokenizer
from world_modelz_tpu.data import (
    BufferedTrajectorySampler,
    SyntheticTrajectorySource,
)
from world_modelz_tpu.diffusion import (
    corrupt_tokens,
    sample_flat_positions,
    sample_time_dependent,
    sparse_denoise_volume,
)
from world_modelz_tpu.models.video import VqSparseDiffusionModel
from world_modelz_tpu.parallel import (
    DEFAULT_TP_RULES,
    make_mesh,
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
    uniform_sample,
    warmup_cosine_schedule,
)
from world_modelz_tpu.train.checkpoint import (
    AsyncCheckpointSaver,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from world_modelz_tpu.utils import (
    MetricLogger,
    dataclass_cli,
    make_grid,
    save_image,
)
from world_modelz_tpu.utils.config import config_to_dict


@dataclasses.dataclass
class SparseDiffusionConfig:
    """Flags mirror minecraft/sparse_diffusion.py:213-269."""

    manual_seed: int = 42
    platform: str = ""  # "", "cpu", "tpu" — the reference's --device flag
    lr: float = 5e-5
    batch_size: int = 48
    eval_batch_size: int = 8
    save_frames: bool = False
    max_steps: int = 500_000
    warmup: int = 500
    weight_decay: float = 1e-2
    optimizer: str = "AdamW"
    ema_decay: float = 0.0
    bf16: bool = False  # bfloat16 compute with f32 master weights
    nan_guard: bool = True  # reject non-finite steps; auto-restore on streaks
    checkpoint: str = ""  # resume path
    # weights-only warm start: load params (and EMA when present) from a
    # checkpoint but keep a fresh optimizer/sampler and step 0 — for
    # fine-tuning, or checkpoints without optimizer state (e.g. imported
    # reference models, cli/import_torch_sparse.py)
    init_from: str = ""

    decoder_model: str = ""
    tokenizer: str = ""  # external tokenizer spec, e.g. "taming:<cfg>,<ckpt>"
    dataset: str = "synthetic"  # synthetic|minerl|video
    mlr_data_dir: str = ""
    image_size: int = 64

    S: int = 32
    H: int = 16
    W: int = 16

    single_batch: bool = False
    eval_interval: int = 1000
    num_eval_iterations: int = 100
    checkpoint_interval: int = 25_000
    sampling_type: str = "neighbors"  # uniform|neighbors
    p_max_uniform: float = 0.1
    uniform_noise: bool = False
    log_interval: int = 10
    # "deferred" (default): log points read the PREVIOUS log point's
    # already-computed scalars so the device keeps a dispatch in flight;
    # "sync" reads at the own step (see video_diffusion.py:log_fence)
    log_fence: str = "deferred"
    histogram_interval: int = 50  # sampler-weight histograms (main2.py:298)
    # write an end-to-end timing breakdown JSON on exit (ledger section
    # train_e2e_sparse reads it): steps/sec over the post-warmup window,
    # host time shares (data+encode / dispatch / device_wait / log /
    # checkpoint / eval), fenced device-step probes and a wall-time
    # reconciliation (train/timing.py)
    timing_report: str = ""
    # every Nth step (timing_report only) isolate one dispatch behind
    # value fences to measure true device ms/step inside the run; 0 = off
    probe_interval: int = 200

    buffer_size: int = 75_000
    max_segment_length: int = 1000
    skip_frames: int = 2
    # "native" = BufferedTrajectorySampler; "grain" = deterministic,
    # checkpointable record stream over a random-access clip view of the
    # same trajectory source (data/trajectory.py TrajectoryClipDataset;
    # the record position rides each checkpoint and restores on resume)
    data_pipeline: str = "native"
    data_workers: int = 0  # grain worker processes (0 = in-process)

    dim: int = 512
    mlp_dim: int = 1024
    heads: int = 4
    depth: int = 8
    num_context: int = 512
    change_batch_interval: int = 4
    # fuse k optimizer steps into one compiled program (lax.scan over the
    # current token batch): amortizes host/RPC dispatch overhead by k.
    # Dispatches never cross a log/histogram/checkpoint/eval/batch-change
    # boundary, so all interval semantics stay exact; k =
    # change_batch_interval makes each batch window exactly one dispatch.
    steps_per_dispatch: int = 1
    # dense-attention backend: auto | flash | xla. "flash" = stock TPU
    # flash-attention kernel (online softmax, no (N,N) score matrix in
    # HBM); auto enables it on TPU for contexts >= 1024 tokens
    attn_backend: str = "auto"

    # mixture-of-experts FFNs (models/attention.py MoEFeedForward): replaces
    # every transformer FFN with moe_experts top-1-routed experts whose
    # expert axis shards over the 'model' mesh axis (expert parallelism).
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25
    moe_aux_weight: float = 1e-2  # load-balance loss weight

    n_model: int = 1
    # ZeRO/FSDP: shard params + EMA + optimizer moments over the 'data'
    # axis (parallel/fsdp.py); composes with --n_model tensor parallelism
    fsdp: bool = False
    # pipeline parallelism over the transformer depth (parallel/pipeline.py):
    # n_pipe stages stream n_micro microbatches; depth % n_pipe == 0 and
    # batch_size % n_micro == 0. Deterministic path (dropout 0).
    n_pipe: int = 1
    n_micro: int = 4
    wandb: bool = False
    project: str = "sparse_diffusion"
    tags: str = ""
    name: str = "sparse_diffusion"
    output_dir: str = "outputs/sparse_diffusion"


def decode_volume(
    tok, tok_state, volume: jnp.ndarray, decode_n: int = 16, ext_tok=None
):
    """Chunked decode of a (B, S, h, w) token volume to pixel frames,
    clamping out-of-codebook (mask) tokens to 0 (sparse_diffusion.py:118-136).
    With `ext_tok` set, decodes through the external FrameTokenizer."""
    n_emb = ext_tok.num_embeddings if ext_tok is not None else tok.num_embeddings
    volume = jnp.where(volume >= n_emb, 0, volume)
    b, s, h, w = volume.shape
    flat = volume.reshape(b * s, h, w)
    frames = []
    if ext_tok is not None:
        flat_np = np.asarray(jax.device_get(flat))
        for i in range(0, flat_np.shape[0], decode_n):
            frames.append(ext_tok.decode(flat_np[i : i + decode_n]))
    else:
        decode = jax.jit(tok.decode)
        for i in range(0, flat.shape[0], decode_n):
            frames.append(
                np.asarray(
                    jax.device_get(decode(tok_state, flat[i : i + decode_n]))
                )
            )
    frames = np.concatenate(frames)
    return frames.reshape(b, s, *frames.shape[1:])


def train(cfg: SparseDiffusionConfig):
    from world_modelz_tpu.utils import compcache

    compcache.enable()  # skip repeat relay compiles (1-4 min each)

    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    mesh = make_mesh(n_model=cfg.n_model, n_pipe=cfg.n_pipe)
    if cfg.tokenizer:
        # external tokenizer plug-in (sparse_diffusion_sber variant)
        from world_modelz_tpu.models.external import make_tokenizer

        ext_tok = make_tokenizer(cfg.tokenizer)
        tok = tok_state = None
        num_embeddings = ext_tok.num_embeddings
    else:
        if not cfg.decoder_model:
            raise ValueError(
                "--decoder_model (tokenizer checkpoint) is required"
            )
        ext_tok = None
        tok, tok_state, _ = load_tokenizer(cfg.decoder_model)
        num_embeddings = tok.num_embeddings
    mask_token = num_embeddings
    shape = (cfg.S, cfg.H, cfg.W)
    volume = cfg.S * cfg.H * cfg.W

    if cfg.dataset == "minerl":
        from world_modelz_tpu.data.trajectory import MineRLTrajectorySource

        src = MineRLTrajectorySource(["MineRLTreechop-v0"], cfg.mlr_data_dir)
    elif cfg.dataset == "video":
        from world_modelz_tpu.data.trajectory import VideoFileTrajectorySource

        src = VideoFileTrajectorySource(
            cfg.mlr_data_dir, frame_size=cfg.image_size
        )
    else:
        src = SyntheticTrajectorySource(
            num_trajectories=16,
            traj_frames=max(3 * cfg.S * (cfg.skip_frames + 1), 200),
            frame_size=cfg.image_size,
        )
    if cfg.data_pipeline == "grain":
        from world_modelz_tpu.data.grain_pipeline import GrainClipPipeline
        from world_modelz_tpu.data.trajectory import TrajectoryClipDataset

        sampler = GrainClipPipeline(
            TrajectoryClipDataset(
                src, traj_len=cfg.S, skip_frames=cfg.skip_frames,
                seed=cfg.manual_seed,
            ),
            cfg.batch_size,
            seed=cfg.manual_seed,
            worker_count=cfg.data_workers,
        )
    else:
        sampler = BufferedTrajectorySampler(
            src,
            buffer_size=cfg.buffer_size,
            max_segment_length=cfg.max_segment_length,
            traj_len=cfg.S,
            skip_frames=cfg.skip_frames,
            seed=cfg.manual_seed,
        )

    if cfg.moe_experts > 0 and cfg.n_pipe > 1:
        raise ValueError(
            "--moe_experts cannot combine with --n_pipe (the pipelined "
            "forward does not thread the MoE aux-loss collection)"
        )
    if cfg.fsdp and cfg.n_pipe > 1:
        raise ValueError(
            "--fsdp cannot combine with --n_pipe: pipeline stages own "
            "their params per 'pipe' device; gathering them over 'data' "
            "would serialize the schedule"
        )
    model = VqSparseDiffusionModel(
        shape=shape,
        num_classes=num_embeddings,
        dim=cfg.dim,
        depth=cfg.depth,
        dim_head=cfg.dim // cfg.heads,
        mlp_dim=cfg.mlp_dim,
        heads=cfg.heads,
        attn_backend=cfg.attn_backend,
        moe_experts=cfg.moe_experts,
        moe_capacity_factor=cfg.moe_capacity_factor,
    )
    key = jax.random.PRNGKey(cfg.manual_seed)
    params = model.init(
        key,
        jnp.zeros((1, cfg.num_context), jnp.int32),
        jnp.zeros((1, cfg.num_context), jnp.int32),
    )["params"]
    print(
        "parameters:",
        f"{sum(x.size for x in jax.tree_util.tree_leaves(params)):,}",
    )

    schedule = warmup_cosine_schedule(cfg.lr, cfg.warmup, cfg.max_steps)
    lr_of = host_schedule(schedule)  # log-point lr reads: no device RPC
    opt = make_optimizer(cfg.optimizer, schedule, cfg.weight_decay)
    opt_state = opt.init(params)
    ema_params = ema_init(params) if cfg.ema_decay > 0 else None
    sampler_state = loss_aware_init()

    start_step = 0
    if cfg.checkpoint and cfg.init_from:
        raise ValueError("--checkpoint (full resume) and --init_from "
                         "(weights-only) are mutually exclusive")
    if cfg.checkpoint:
        target = {
            "params": params,
            "ema": ema_params if ema_params is not None else {},
            "opt_state": opt_state,
            "sampler": sampler_state,
        }
        restored, start_step, _ = restore_checkpoint(cfg.checkpoint, target)
        params = restored["params"]
        ema_params = restored["ema"] if cfg.ema_decay > 0 else None
        opt_state = restored["opt_state"]
        sampler_state = restored["sampler"]
        if hasattr(sampler, "set_state"):
            gs = os.path.join(cfg.checkpoint, "grain_state.json")
            if os.path.exists(gs):
                with open(gs, "rb") as f:
                    sampler.set_state(f.read())
                print("input pipeline resumed from", gs)
        print(f"resumed from {cfg.checkpoint} at step {start_step}")
    elif cfg.init_from:
        # weights only: no target, so any optimizer/sampler layout (or
        # none at all) in the source checkpoint is fine
        restored, at_step, _ = restore_checkpoint(cfg.init_from)
        params = restored["params"]
        opt_state = opt.init(params)
        if cfg.ema_decay > 0:
            ema_params = (
                restored["ema"] if restored.get("ema") else ema_init(params)
            )
        print(f"warm start from {cfg.init_from} (step {at_step} weights; "
              "fresh optimizer, step 0)")

    if cfg.fsdp:
        from world_modelz_tpu.parallel import (
            fsdp_shardings,
            opt_state_shardings,
        )

        p_shard = fsdp_shardings(params, mesh, DEFAULT_TP_RULES)
        opt_shard = opt_state_shardings(opt_state, params, p_shard, mesh)
    else:
        p_shard = shard_params(params, mesh, DEFAULT_TP_RULES)
        opt_shard = replicated(mesh)
    params = jax.device_put(params, p_shard)
    opt_state = jax.device_put(opt_state, opt_shard)
    if tok_state is not None:
        tok_state = jax.device_put(tok_state, replicated(mesh))
    if ema_params is not None:
        ema_params = jax.device_put(ema_params, p_shard)

    # Batches cross host->device as uint8 (4x less relay traffic than
    # float32 — 12.5 MB vs 50 MB per refresh at b16 S16 64^2 rgb) and are
    # normalized on device inside the encode program. A PrefetchIterator
    # keeps the next raw batch sampled + transferred while the device is
    # busy with the current dispatches (the round-3 e2e timing window
    # measured 48.6% of wall time in synchronous sample+transfer).
    if ext_tok is not None:

        def encode_batch(frames):
            frames = np.asarray(frames, np.float32) / 255.0
            b, s, hh, ww, c = frames.shape
            z = ext_tok.encode(frames.reshape(b * s, hh, ww, c))
            return jnp.asarray(z.reshape(b, s, z.shape[1], z.shape[2]))

    else:

        @jax.jit
        def encode_batch(frames):
            frames = frames.astype(jnp.float32) / 255.0
            b, s, hh, ww, c = frames.shape
            if c != tok.in_channels:
                raise ValueError(
                    f"data has {c} channels but the tokenizer was trained "
                    f"with in_channels={tok.in_channels} "
                    "(check --decoder_model vs --dataset)"
                )
            z = tok.encode(tok_state, frames.reshape(b * s, hh, ww, c))
            return z.reshape(b, s, z.shape[1], z.shape[2])

    def step_body(batch_z, carry, key):
        """One optimizer step as a scan body (steps_per_dispatch fuses k
        of them over the same token batch — matching the reference's
        reuse of a batch for change_batch_interval steps)."""
        params, ema_params, opt_state, sampler_state = carry
        b = batch_z.shape[0]
        k_r, k_idx, k_corrupt = jax.random.split(key, 3)

        if cfg.uniform_noise:
            r = uniform_sample(k_r, b)
        else:
            r = loss_aware_sample(sampler_state, k_r, b)

        if cfg.sampling_type == "uniform":
            indices = sample_flat_positions(
                k_idx, b, cfg.num_context, volume
            )
        else:
            indices = sample_time_dependent(
                k_idx, b, cfg.num_context, shape, r
            )

        flat = batch_z.reshape(b, -1)
        target = jnp.take_along_axis(flat, indices, axis=1)
        corrupted, _ = corrupt_tokens(
            k_corrupt,
            target,
            r,
            num_classes=num_embeddings,
            mask_token=mask_token,
            p_max_uniform=cfg.p_max_uniform,
        )

        def loss_fn(p):
            if cfg.bf16:
                p = jax.tree_util.tree_map(
                    lambda x: x.astype(jnp.bfloat16)
                    if x.dtype == jnp.float32
                    else x,
                    p,
                )
            if cfg.n_pipe > 1:
                from world_modelz_tpu.parallel.pipelined_sparse import (
                    sparse_forward_pipelined,
                )

                mb = b // cfg.n_micro
                logits = sparse_forward_pipelined(
                    model, p, corrupted, indices, mesh,
                    n_micro=cfg.n_micro,
                    # shard microbatch rows over 'data' when they divide
                    data_axis="data"
                    if mb % mesh.shape["data"] == 0
                    else None,
                ).astype(jnp.float32)
            elif cfg.moe_experts > 0:
                logits, aux_vars = model.apply(
                    {"params": p}, corrupted, indices, mutable=["losses"]
                )
                logits = logits.astype(jnp.float32)
            else:
                logits = model.apply(
                    {"params": p}, corrupted, indices
                ).astype(jnp.float32)
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, num_embeddings), target.reshape(-1)
            )
            loss = ce.mean()
            if cfg.moe_experts > 0:
                aux_leaves = jax.tree_util.tree_leaves(aux_vars["losses"])
                moe_aux = sum(jnp.mean(a) for a in aux_leaves) / max(
                    1, len(aux_leaves)
                )
                loss = loss + cfg.moe_aux_weight * moe_aux
            return loss, ce.reshape(b, -1).mean(axis=1)

        (loss, per_sample), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        gn = optax.global_norm(grads)
        old = (params, ema_params, opt_state, sampler_state)
        if not cfg.uniform_noise:
            sampler_state = loss_aware_update(
                sampler_state, r, jnp.nan_to_num(per_sample)
            )
        updates, opt_state = opt.update(
            jax.tree_util.tree_map(jnp.nan_to_num, grads), opt_state, params
        )
        params = optax.apply_updates(params, updates)
        if ema_params is not None:
            ema_params = ema_update(ema_params, params, cfg.ema_decay)
        # failure detection: reject the whole step on a non-finite loss/grad
        # (train/guard.py semantics, on-device — no per-step host sync)
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
        separate float()/bool() reads cost three relay roundtrips per
        log point (see cli/video_diffusion.py)."""
        return jnp.stack(
            [loss.astype(jnp.float32), gn.astype(jnp.float32),
             ok.astype(jnp.float32)]
        )

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def train_step(params, ema_params, opt_state, sampler_state, batch_z, key):
        carry, (loss, gn, ok) = step_body(
            batch_z, (params, ema_params, opt_state, sampler_state), key
        )
        return (*carry, _pack_stats(loss, gn, ok))

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def train_kstep(params, ema_params, opt_state, sampler_state, batch_z,
                    keys):
        """n fused optimizer steps over the SAME token batch, one compiled
        program. Returns the last substep's loss/grad-norm (the step the
        host logs) and the AND of the guard flags."""
        carry, (losses, gns, oks) = jax.lax.scan(
            lambda c, k: step_body(batch_z, c, k),
            (params, ema_params, opt_state, sampler_state),
            keys,
        )
        return (*carry, _pack_stats(losses[-1], gns[-1], oks.all()))

    def run_eval(params_eval, tag, step):
        logits_fn = lambda toks, idx: model.apply(
            {"params": params_eval}, toks, idx
        )
        vol = sparse_denoise_volume(
            jax.random.PRNGKey(step),
            jax.jit(logits_fn),
            batch_size=cfg.eval_batch_size,
            shape=shape,
            num_classes=num_embeddings,
            mask_token=mask_token,
            num_context=cfg.num_context,
            num_iterations=cfg.num_eval_iterations,
            sampling_type=cfg.sampling_type,
        )
        frames = decode_volume(tok, tok_state, vol, ext_tok=ext_tok)
        grid = make_grid(
            frames.reshape(-1, *frames.shape[2:]), nrow=cfg.S
        )
        fn = f"{cfg.output_dir}/{cfg.name}_eval_{step:07d}_{tag}.png"
        save_image(grid, fn)
        if cfg.save_frames:
            for i in range(frames.shape[1]):
                save_image(
                    make_grid(frames[:, i]),
                    f"{cfg.output_dir}/{cfg.name}_{tag}_frame_{i:03d}.png",
                )
        print("eval artifact:", fn)

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
            jax.device_put(restored["sampler"], replicated(mesh)),
        )

    guard = CheckpointGuard(restore_latest)
    from world_modelz_tpu.data.prefetch import PrefetchIterator

    batches = PrefetchIterator(
        lambda: sampler.sample_batch(cfg.batch_size),  # raw uint8
        depth=2,
        # internal tokenizer: ship uint8 to device from the worker thread
        # (overlaps the current dispatches); external (host) tokenizer
        # consumes numpy, so keep batches on host
        device_put=ext_tok is None,
        # grain: the CONSUMED record position rides each checkpoint
        state_fn=(
            sampler.get_state if hasattr(sampler, "get_state") else None
        ),
    )
    rejected = 0
    batch_z = None
    t0 = time.time()
    # Deferred log readback (cfg.log_fence="deferred"): see
    # video_diffusion.py — log points enqueue their scalar readbacks and
    # read the PREVIOUS point's (already-computed) values, keeping a
    # dispatch in flight through every log point. Timing windows open and
    # close only on explicit value fences (queue drains).
    pending = deque()  # (step, packed (loss, gn, ok), host_steps_per_sec)

    # end-to-end timing (cfg.timing_report): host buckets, a fenced
    # steps/sec window, device probes and a wall-time reconciliation
    # (train/timing.py)
    from world_modelz_tpu.train.timing import TrainTiming, fence_value

    tm = TrainTiming(
        probe_interval=cfg.probe_interval if cfg.timing_report else 0
    )

    def flush_log_entry(entry):
        """Read back and log one enqueued log point (a value fence for the
        dispatch that produced it). Returns the guard's restore tuple when
        NaN escalation fired, else None. Value reads are charged to
        device_wait (they block on device compute when enqueue runs
        ahead); pure host logging to log."""
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
        crossing the next log/histogram/checkpoint/eval/batch-change/
        probe/max_steps boundary (host work happens at exact step
        multiples, and a batch refresh lands at steps == 1 mod
        change_batch_interval exactly as with k=1)."""
        stop = cfg.max_steps
        first_log = start_step + 1  # compile/warmup log point
        if done < first_log:
            stop = min(stop, first_log)
        intervals = [cfg.log_interval, cfg.histogram_interval,
                     cfg.checkpoint_interval, cfg.eval_interval,
                     tm.probe_interval]
        if not cfg.single_batch:
            intervals.append(cfg.change_batch_interval)
        for iv in intervals:
            if iv:
                stop = min(stop, (done // iv + 1) * iv)
        return max(1, min(kdisp, stop - done))

    try:
        step = start_step
        stats = None  # packed (loss, gn, ok) of the most recent dispatch
        while step < cfg.max_steps:
            if batch_z is None or (
                not cfg.single_batch
                and (step + 1) % cfg.change_batch_interval == 1
            ):
                tt = time.perf_counter()
                batch_z = encode_batch(next(batches))
                tm.add("data", time.perf_counter() - tt)
                if cfg.single_batch and step == 0:
                    gt = decode_volume(tok, tok_state, batch_z, ext_tok=ext_tok)
                    save_image(
                        make_grid(
                            gt.reshape(-1, *gt.shape[2:]), nrow=cfg.S
                        ),
                        f"{cfg.output_dir}/gt.png",
                    )

            n = dispatch_len(step)
            keys = jax.random.split(key, n + 1)
            key = keys[0]
            # device probe: isolate this dispatch behind value fences (see
            # video_diffusion.py; only at the steady-state compiled size)
            probe = tm.probe_due(step + n) and tm.opened and n in seen_sizes
            if probe:
                tp = time.perf_counter()
                fence_value(stats)  # device idle behind the last dispatch
                fence_value(batch_z)  # the encoded batch has materialized
                td = time.perf_counter()
            else:
                tt = time.perf_counter()
            if n == 1:
                (params, ema_params, opt_state, sampler_state,
                 stats) = train_step(
                    params, ema_params, opt_state, sampler_state, batch_z,
                    keys[1],
                )
            else:
                (params, ema_params, opt_state, sampler_state,
                 stats) = train_kstep(
                    params, ema_params, opt_state, sampler_state, batch_z,
                    keys[1:],
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
                # (intermediate points keep one entry in flight; the close
                # fence is the end-of-run drain)
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

            if (
                cfg.histogram_interval
                and not cfg.uniform_noise
                and step % cfg.histogram_interval == 0
            ):
                logger.log_histogram(
                    step,
                    "sampler_weights",
                    np.asarray(loss_aware_weights(sampler_state)),
                )

            if cfg.checkpoint_interval and step % cfg.checkpoint_interval == 0:
                tt = time.perf_counter()
                # async: snapshot to fresh device buffers, write in the
                # background; the timer charges only the host-blocking part
                grain_state = batches.consumed_state()
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
                run_eval(params, "base", step)
                if ema_params is not None:
                    run_eval(ema_params, "ema", step)
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
                    extra={
                        "num_context": cfg.num_context,
                        "num_classes": num_embeddings,  # FLOPs: logit head
                    },
                    h2d_stats=batches.transfer_stats(),
                    config=config_to_dict(cfg),
                ),
            )
        try:
            saver.wait()  # the last async save must land before exit
        except Exception as e:
            print("[checkpoint] async save failed:", e)
        logger.close()
        batches.close()
        sampler.close()

    return params


def main(argv=None):
    cfg = dataclass_cli(SparseDiffusionConfig, argv)
    print("Config:", cfg)
    train(cfg)


if __name__ == "__main__":
    main()
