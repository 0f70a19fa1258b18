"""VQ-VAE tokenizer training CLI.

Parity with minecraft/train_vqae.py:170-316 (and the vq-video-diffusion /
som-diffusion copies): L1/MSE/SmoothL1 reconstruction + weighted commitment
loss, periodic dead-code revival (`vq_reuse_interval`), checkpointing with
embedded config, reconstruction PNG grids, per-step metric logging.

TPU-first: one jitted global-view train step over a ('data','model') mesh —
batch sharded over `data`; VQ-EMA statistics, BatchNorm batch stats and
gradients all reduce across devices automatically (SURVEY.md §2.2). The
input pipeline prefetches host batches to device.
"""

from __future__ import annotations

import dataclasses
import os
import time
from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from world_modelz_tpu.data import (
    FileListImageDataset,
    MovingMNIST,
    PrefetchIterator,
    SyntheticTrajectorySource,
)
from world_modelz_tpu.data.images import load_file_list
from world_modelz_tpu.models import TokenizerState, VQAutoEncoder
from world_modelz_tpu.ops import vq_reset_stats, vq_reuse_inactive
from world_modelz_tpu.parallel import batch_sharding, make_mesh, replicated
from world_modelz_tpu.train import (
    CheckpointGuard,
    host_schedule,
    make_optimizer,
    step_decay_schedule,
)
from world_modelz_tpu.train.checkpoint import (
    AsyncCheckpointSaver,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from world_modelz_tpu.utils import MetricLogger, dataclass_cli, save_image
from world_modelz_tpu.utils.config import config_from_dict, config_to_dict


@dataclasses.dataclass
class TrainVqaeConfig:
    """Flags mirror minecraft/train_vqae.py:70-102."""

    manual_seed: int = 0
    platform: str = ""  # "", "cpu", "tpu" — the reference's --device flag
    batch_size: int = 96
    optimizer: str = "AdamW"
    weight_decay: float = 1e-4
    lr: float = 2e-4
    loss_fn: str = "MAE"  # MAE|L1|MSE|SmoothL1
    nan_guard: bool = True  # reject non-finite steps; auto-restore on streaks
    max_steps: int = 10000
    lr_decay_interval: int = 3000  # reference: halve lr every 3 epochs

    # "xla" | "pallas": fused Pallas VQ search+stats kernels on the
    # quantizer hot path (single-chip; see models/tokenizer.py)
    vq_backend: str = "xla"

    downscale_steps: int = 3
    embedding_dim: int = 64
    hidden_planes: int = 128
    num_embeddings: int = 512
    in_channels: int = 3

    dataset: str = "synthetic"  # synthetic|moving_mnist|files
    # "native" = in-repo samplers; "grain" = deterministic, checkpointable
    # record stream (moving_mnist/files — the random-access sources); the
    # iterator position rides each checkpoint and restores on resume
    data_pipeline: str = "native"
    data_workers: int = 0  # grain worker processes (0 = in-process)
    image_size: int = 64
    file_list_fn: str = "file_list.json"
    image_dir_path: str = ""
    image_fn_regex: str = r".*\.png$"

    checkpoint_interval: int = 2500
    latent_loss_weight: float = 0.005
    vq_reuse_interval: int = 500
    log_interval: int = 50

    n_model: int = 1  # tensor-parallel mesh axis (tokenizer is conv: DP only)
    wandb: bool = False
    project: str = "mcvq"
    tags: str = ""
    name: str = "vqae"
    output_dir: str = "outputs/vqae"
    checkpoint: str = ""  # resume path


def build_batch_fn(cfg: TrainVqaeConfig, seed: int):
    """Host batch source -> ((() -> (B, H, W, C) float32 in [0,1]),
    checkpointable-pipeline-or-None)."""
    rng = np.random.default_rng(seed)
    if cfg.data_pipeline == "grain":
        # deterministic, checkpointable record stream over the
        # random-access sources (see data/grain_pipeline.py)
        from world_modelz_tpu.data.grain_pipeline import GrainClipPipeline

        if cfg.dataset == "moving_mnist":
            ds = MovingMNIST(
                seq_len=1, image_size=cfg.image_size, digit_size=24,
                num_digits=2,
            )
            pipe = GrainClipPipeline(
                ds, cfg.batch_size, seed=seed,
                worker_count=cfg.data_workers,
            )
            return lambda: pipe.sample_batch()[:, 0], pipe
        if cfg.dataset == "files":
            files = load_file_list(
                cfg.file_list_fn, cfg.image_dir_path, cfg.image_fn_regex
            )
            ds = FileListImageDataset(files, cfg.batch_size, seed=seed)
            pipe = GrainClipPipeline(
                ds, cfg.batch_size, seed=seed,
                worker_count=cfg.data_workers,
            )
            return pipe.sample_batch, pipe
        raise ValueError(
            f"--data_pipeline grain is not supported for dataset "
            f"{cfg.dataset!r} (random-access sources only)"
        )
    if cfg.dataset == "moving_mnist":
        if cfg.in_channels != 1:
            raise ValueError(
                "--dataset moving_mnist produces 1-channel frames; pass "
                f"--in_channels 1 (got {cfg.in_channels})"
            )
        ds = MovingMNIST(
            seq_len=1, image_size=cfg.image_size, digit_size=24, num_digits=2
        )
        return lambda: ds.sample_batch(rng, cfg.batch_size)[:, 0], None
    if cfg.dataset == "files":
        files = load_file_list(
            cfg.file_list_fn, cfg.image_dir_path, cfg.image_fn_regex
        )
        ds = FileListImageDataset(files, cfg.batch_size, seed=seed)
        return ds.next_batch, None
    if cfg.dataset == "synthetic":
        if cfg.in_channels != 3:
            raise ValueError(
                "--dataset synthetic produces 3-channel (RGB) frames; pass "
                f"--in_channels 3 (got {cfg.in_channels})"
            )
        src = SyntheticTrajectorySource(
            num_trajectories=32, traj_frames=64, frame_size=cfg.image_size,
            seed=seed,
        )
        frames = np.concatenate(
            [np.stack(list(src.load_frames(n))) for n in src.trajectory_names()]
        ).astype(np.float32) / 255.0

        def sample():
            idx = rng.integers(0, len(frames), cfg.batch_size)
            return frames[idx]

        return sample, None
    raise ValueError(f"unknown dataset {cfg.dataset!r}")


def make_tokenizer(cfg: TrainVqaeConfig) -> VQAutoEncoder:
    return VQAutoEncoder(
        embedding_dim=cfg.embedding_dim,
        num_embeddings=cfg.num_embeddings,
        downscale_steps=cfg.downscale_steps,
        hidden_planes=cfg.hidden_planes,
        in_channels=cfg.in_channels,
        vq_backend=cfg.vq_backend,
    )


def load_tokenizer(
    ckpt_path: str,
) -> Tuple[VQAutoEncoder, TokenizerState, dict]:
    """Rehydrate a frozen tokenizer from a checkpoint's embedded config —
    the reference's decoder_model loading contract (main2.py:390-396)."""
    state, _step, config = restore_checkpoint(ckpt_path)
    cfg = config_from_dict(TrainVqaeConfig, config)
    tok = make_tokenizer(cfg)
    tok_state = TokenizerState(
        params=state["tokenizer"]["params"],
        batch_stats=state["tokenizer"]["batch_stats"],
        vq=jax.tree_util.tree_map(
            jnp.asarray, state["tokenizer"]["vq"], is_leaf=None
        ),
    )
    from world_modelz_tpu.ops.vq import VQState

    if not isinstance(tok_state.vq, VQState):
        tok_state = tok_state.replace(vq=VQState(**state["tokenizer"]["vq"]))
    return tok, tok_state, config


def _loss_fn(kind: str):
    kind = kind.lower()
    if kind in ("mae", "l1"):
        return lambda a, b: jnp.mean(jnp.abs(a - b))
    if kind == "mse":
        return lambda a, b: jnp.mean((a - b) ** 2)
    if kind == "smoothl1":
        return lambda a, b: jnp.mean(optax.huber_loss(a, b, delta=1.0))
    raise ValueError(f"unsupported loss {kind!r}")


def train(cfg: TrainVqaeConfig) -> Tuple[TokenizerState, dict]:
    from world_modelz_tpu.utils import compcache

    compcache.enable()  # skip repeat relay compiles (1-4 min each)

    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    mesh = make_mesh(n_model=cfg.n_model)
    n_data = mesh.shape["data"]
    if cfg.batch_size % n_data != 0:
        raise ValueError(
            f"batch_size {cfg.batch_size} must be divisible by the "
            f"data-parallel axis ({n_data} devices)"
        )
    if cfg.vq_backend == "pallas" and n_data > 1:
        # an opaque pallas_call cannot be sharded by GSPMD: under data
        # parallelism it would silently de-shard the quantizer hot path
        # (models/tokenizer.py docstring). Fall back loudly.
        print(
            f"[train_vqae] --vq_backend pallas is single-chip only; the "
            f"mesh has data={n_data} — using the XLA quantizer path"
        )
        cfg = dataclasses.replace(cfg, vq_backend="xla")
    tok = make_tokenizer(cfg)
    recon_loss = _loss_fn(cfg.loss_fn)

    key = jax.random.PRNGKey(cfg.manual_seed)
    sample = jnp.zeros(
        (1, cfg.image_size, cfg.image_size, cfg.in_channels), jnp.float32
    )
    state = tok.init(key, sample)
    print(
        "latent grid:",
        tok.token_grid_shape((cfg.image_size, cfg.image_size)),
        "params:",
        sum(x.size for x in jax.tree_util.tree_leaves(state.params)),
    )

    schedule = step_decay_schedule(
        cfg.lr, steps_per_epoch=cfg.lr_decay_interval, epoch_step_size=1
    )
    lr_of = host_schedule(schedule)  # log-point lr reads: no device RPC
    opt = make_optimizer(cfg.optimizer, schedule, cfg.weight_decay)
    opt_state = opt.init(state.params)

    start_step = 0
    if cfg.checkpoint:
        restored, start_step, _ = restore_checkpoint(
            cfg.checkpoint,
            target={
                "tokenizer": state,
                "opt_state": opt_state,
            },
        )
        state, opt_state = restored["tokenizer"], restored["opt_state"]
        print(f"resumed from {cfg.checkpoint} at step {start_step}")

    repl = replicated(mesh)
    state = jax.device_put(state, repl)
    opt_state = jax.device_put(opt_state, repl)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(state: TokenizerState, opt_state, batch):
        def loss(params):
            st = state.replace(params=params)
            recon, out, new_state = tok.forward(st, batch, train=True)
            r_loss = recon_loss(recon, batch)
            total = r_loss + cfg.latent_loss_weight * out.commitment_loss
            return total, (r_loss, out, new_state, recon)

        (total, (r_loss, out, new_state, recon)), grads = jax.value_and_grad(
            loss, has_aux=True
        )(state.params)
        gn = optax.global_norm(grads)
        updates, new_opt = opt.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {
            "loss": total,
            "r_loss": r_loss,
            "latent_loss": out.commitment_loss,
            "perplexity": out.perplexity,
            "grad_norm": gn,
        }
        new_state = new_state.replace(params=params)
        # failure detection: reject the whole step on a non-finite loss/grad
        # (params, VQ-EMA stats, batch stats and optimizer stay untouched) —
        # train/guard.py semantics, on-device so no per-step host sync
        ok = jnp.isfinite(total) & jnp.isfinite(gn)
        if cfg.nan_guard:
            from world_modelz_tpu.train.guard import reject_nonfinite

            new_state, new_opt = reject_nonfinite(
                ok, (state, opt_state), (new_state, new_opt)
            )
        return new_state, new_opt, metrics, recon, ok

    @jax.jit
    def reuse_step(state: TokenizerState):
        vq, count = vq_reuse_inactive(state.vq)
        return state.replace(vq=vq_reset_stats(vq)), count

    batch_fn, pipeline = build_batch_fn(cfg, cfg.manual_seed)
    if pipeline is not None and cfg.checkpoint:
        gs = os.path.join(cfg.checkpoint, "grain_state.json")
        if os.path.exists(gs):
            with open(gs, "rb") as f:
                pipeline.set_state(f.read())
            print("input pipeline resumed from", gs)
    batches = PrefetchIterator(
        batch_fn, depth=2, sharding=batch_sharding(mesh),
        # position snapshots ride the queue with each batch so the
        # checkpoint sidecar records the CONSUMED position (see
        # video_diffusion.py for the full rationale)
        state_fn=pipeline.get_state if pipeline is not None else None,
    )
    logger = MetricLogger(
        cfg.output_dir,
        cfg.name,
        use_wandb=cfg.wandb,
        project=cfg.project,
        config=config_to_dict(cfg),
        tags=cfg.tags,
    )

    saver = AsyncCheckpointSaver()

    def restore_latest():
        """Reload the newest on-disk checkpoint (guard escalation path)."""
        saver.wait()  # an in-flight async save must land first
        path = latest_checkpoint(cfg.output_dir) or cfg.checkpoint
        if not path:
            return None
        restored, at_step, _ = restore_checkpoint(
            path,
            target={"tokenizer": jax.device_get(state),
                    "opt_state": jax.device_get(opt_state)},
        )
        print(f"[guard] restored {path} (step {at_step})")
        return (
            jax.device_put(restored["tokenizer"], repl),
            jax.device_put(restored["opt_state"], repl),
        )

    guard = CheckpointGuard(restore_latest)
    rejected = 0
    last_recon = None
    t0 = time.time()
    try:
        for step in range(start_step + 1, cfg.max_steps + 1):
            batch = next(batches)
            state, opt_state, metrics, last_recon, ok = train_step(
                state, opt_state, batch
            )

            if cfg.vq_reuse_interval and step % cfg.vq_reuse_interval == 0:
                state, reused = reuse_step(state)
                metrics["reused"] = reused

            if step % cfg.log_interval == 0 or step == start_step + 1:
                # guard acts on-device every step; host samples the flag at
                # log points only (no per-step readback sync)
                accepted = bool(ok) or not cfg.nan_guard
                if not accepted:
                    rejected += 1
                    print(f"{step}: step REJECTED (non-finite loss/grads)")
                restored = guard.record(accepted, step)
                if restored is not None:
                    state, opt_state = restored
                m = {k: float(v) for k, v in metrics.items()}
                m["lr"] = lr_of(step)
                m["steps_per_sec"] = cfg.log_interval / max(
                    time.time() - t0, 1e-9
                )
                t0 = time.time()
                logger.log(step, **m)
                print(
                    f"step {step}: loss {m['loss']:.4f} "
                    f"perplexity {m['perplexity']:.1f} lr {m['lr']:.2e}"
                )

            if cfg.checkpoint_interval and step % cfg.checkpoint_interval == 0:
                # grain position of the last CONSUMED batch rides the
                # checkpoint as a sidecar (None for native sources)
                grain_state = batches.consumed_state()
                path = saver.save(
                    cfg.output_dir,
                    step,
                    {"tokenizer": state, "opt_state": opt_state},
                    config_to_dict(cfg),
                    extra_files=(
                        {"grain_state.json": grain_state}
                        if grain_state is not None
                        else None
                    ),
                )
                print("checkpoint:", path)
                grid = np.asarray(jax.device_get(last_recon))
                save_image(
                    grid[:16],
                    f"{cfg.output_dir}/{cfg.name}_reconst_{step:07d}.png",
                )
    finally:
        try:
            saver.wait()  # the last async save must land before exit
        except Exception as e:
            print("[checkpoint] async save failed:", e)
        batches.close()
        logger.close()

    grain_state = batches.consumed_state()
    final = save_checkpoint(
        cfg.output_dir,
        cfg.max_steps,
        {"tokenizer": state, "opt_state": opt_state},
        config_to_dict(cfg),
        extra_files=(
            {"grain_state.json": grain_state}
            if grain_state is not None
            else None
        ),
    )
    print("final checkpoint:", final)
    return state, {"checkpoint": final}


def main(argv=None):
    cfg = dataclass_cli(TrainVqaeConfig, argv)
    print("Config:", cfg)
    train(cfg)


if __name__ == "__main__":
    main()
