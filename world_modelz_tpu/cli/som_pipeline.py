"""The som-diffusion 5-stage pipeline CLIs.

Parity with the manual checkpoint-coupled pipeline of SURVEY.md §3.5
(som-diffusion/experiments/ds2/README.md):

1. `train_ae`    — conv AE without SOM (train_ae.py; pass_through_som=False)
2. `train_som`   — fit the SOM on frozen-AE latents via `som_adapt` with
                   linearly decaying eta and exponentially decaying sigma
                   (train_som.py:57-129), optional SOM re-sizing (:168-173)
3. `finetune_ae` — joint AE+SOM straight-through finetuning with interleaved
                   SOM adaption (finetune_ae.py:167-240)
4. `create_diffusion_dataset` — encode the image set to (N, h, w, 2)
                   normalized SOM-coordinate latents (create_diffusion_dataset
                   .py:73-97)
5. `train_diffusion` — UNet eps-prediction DDPM on those latents with cosine
                   alpha-bar, EMA, and x0-reprojection sampling evals
                   (train_diffusion.py:79-172)

Stages couple only through checkpoints with embedded configs, exactly like
the reference. All device work is jitted global-view; the SOM adapt chunk
loop is a lax.scan (ops/som.py).
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from world_modelz_tpu.data import FileListImageDataset, PrefetchIterator
from world_modelz_tpu.data.images import load_file_list
from world_modelz_tpu.data.trajectory import SyntheticTrajectorySource
from world_modelz_tpu.diffusion.ddpm import ddpm_corrupt, ddpm_sample
from world_modelz_tpu.models.som_autoencoder import (
    SomAutoEncoder,
    SomTokenizerState,
)
from world_modelz_tpu.models.unet import UNetDiffusionModel
from world_modelz_tpu.ops.som import som_adapt
from world_modelz_tpu.train import (
    CheckpointGuard,
    ema_init,
    ema_update,
    make_optimizer,
    host_schedule,
    step_decay_schedule,
    warmup_cosine_schedule,
)
from world_modelz_tpu.train.guard import reject_nonfinite as _reject_nonfinite
from world_modelz_tpu.train.checkpoint import (
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
from world_modelz_tpu.utils.config import config_from_dict, config_to_dict
from world_modelz_tpu.ops.som import SomState


# ---------------------------------------------------------------------------
# shared helpers
# ---------------------------------------------------------------------------


def _image_batch_fn(dataset, file_list_fn, image_dir_path, image_fn_regex,
                    batch_size, image_size, seed):
    rng = np.random.default_rng(seed)
    if dataset == "files":
        files = load_file_list(file_list_fn, image_dir_path, image_fn_regex)
        ds = FileListImageDataset(files, batch_size, seed=seed)
        return ds.next_batch
    src = SyntheticTrajectorySource(
        num_trajectories=32, traj_frames=64, frame_size=image_size, seed=seed
    )
    frames = np.concatenate(
        [np.stack(list(src.load_frames(n))) for n in src.trajectory_names()]
    ).astype(np.float32) / 255.0

    def sample():
        return frames[rng.integers(0, len(frames), batch_size)]

    return sample


def _make_ae(cfg, pass_through: bool) -> SomAutoEncoder:
    return SomAutoEncoder(
        embedding_dim=cfg.embedding_dim,
        downscale_steps=cfg.downscale_steps,
        hidden_planes=cfg.hidden_planes,
        som_width=getattr(cfg, "som_width", 128) or 128,
        som_height=getattr(cfg, "som_height", 128) or 128,
        pass_through_som=pass_through,
    )


def load_som_ae(
    ckpt_path: str, pass_through: bool = True
) -> Tuple[SomAutoEncoder, SomTokenizerState, dict]:
    """Rehydrate a SomAutoEncoder from an embedded-config checkpoint."""
    state, _step, config = restore_checkpoint(ckpt_path)
    ae_cfg = config_from_dict(TrainAeConfig, config)
    width = int(config.get("som_width") or 128)
    height = int(config.get("som_height") or 128)
    ae = SomAutoEncoder(
        embedding_dim=ae_cfg.embedding_dim,
        downscale_steps=ae_cfg.downscale_steps,
        hidden_planes=ae_cfg.hidden_planes,
        som_width=width,
        som_height=height,
        pass_through_som=pass_through,
    )
    raw = state["ae"]
    som = raw["som"]
    if not isinstance(som, SomState):
        som = SomState(
            embedding=jnp.asarray(som["embedding"]),
            activation_count=jnp.asarray(som["activation_count"]),
            width=width,
            height=height,
        )
    ae_state = SomTokenizerState(
        params=raw["params"], batch_stats=raw["batch_stats"], som=som
    )
    return ae, ae_state, config


def _save_ae_ckpt(cfg, step, ae: SomAutoEncoder, state, extra=None):
    payload = {"ae": state}
    if extra:
        payload.update(extra)
    config = config_to_dict(cfg)
    config["som_width"] = ae.som_width
    config["som_height"] = ae.som_height
    return save_checkpoint(cfg.output_dir, step, payload, config)


# ---------------------------------------------------------------------------
# stage 1: train_ae
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TrainAeConfig:
    """Flags mirror som-diffusion/train_ae.py:34-60."""

    manual_seed: int = 0
    platform: str = ""
    batch_size: int = 96
    optimizer: str = "AdamW"
    lr: float = 2e-4
    loss_fn: str = "SmoothL1"
    nan_guard: bool = True  # reject non-finite steps; auto-restore on streaks
    max_steps: int = 10000
    lr_decay_interval: int = 3000

    downscale_steps: int = 3
    embedding_dim: int = 64
    hidden_planes: int = 128

    dataset: str = "synthetic"  # synthetic|files
    image_size: int = 64
    file_list_fn: str = "file_list.json"
    image_dir_path: str = ""
    image_fn_regex: str = r".*\.png$"

    checkpoint_interval: int = 2500
    log_interval: int = 50
    wandb: bool = False
    project: str = "som-diffusion"
    tags: str = ""
    name: str = "ae"
    output_dir: str = "outputs/som_ae"


def _recon_loss(kind: str):
    kind = kind.lower()
    if kind in ("mae", "l1"):
        return lambda a, b: jnp.mean(jnp.abs(a - b))
    if kind == "mse":
        return lambda a, b: jnp.mean((a - b) ** 2)
    return lambda a, b: jnp.mean(optax.huber_loss(a, b, delta=1.0))


def train_ae(cfg: TrainAeConfig):
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    ae = _make_ae(cfg, pass_through=False)
    key = jax.random.PRNGKey(cfg.manual_seed)
    state = ae.init(
        key, jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
    )
    loss_fn = _recon_loss(cfg.loss_fn)

    schedule = step_decay_schedule(
        cfg.lr, steps_per_epoch=cfg.lr_decay_interval, epoch_step_size=1
    )
    lr_of = host_schedule(schedule)  # log-point lr reads: no device RPC
    opt = make_optimizer(cfg.optimizer, schedule)
    opt_state = opt.init(state.params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(state, opt_state, batch):
        def loss(params):
            st = state.replace(params=params)
            recon, _h, _d, new_state = ae.forward(st, batch, train=True)
            return loss_fn(recon, batch), (new_state, recon)

        (l, (new_state, recon)), grads = jax.value_and_grad(
            loss, has_aux=True
        )(state.params)
        gn = optax.global_norm(grads)
        old = (state, opt_state)
        updates, opt_state = opt.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = new_state.replace(params=params)
        ok = jnp.isfinite(l) & jnp.isfinite(gn)
        if cfg.nan_guard:
            new_state, opt_state = _reject_nonfinite(
                ok, old, (new_state, opt_state)
            )
        return new_state, opt_state, l, recon, ok

    batch_fn = _image_batch_fn(
        cfg.dataset, cfg.file_list_fn, cfg.image_dir_path, cfg.image_fn_regex,
        cfg.batch_size, cfg.image_size, cfg.manual_seed,
    )
    batches = PrefetchIterator(batch_fn, depth=2)
    logger = MetricLogger(cfg.output_dir, cfg.name, use_wandb=cfg.wandb,
                         project=cfg.project, config=config_to_dict(cfg))
    def restore_latest():
        path = latest_checkpoint(cfg.output_dir)
        if not path:
            return None
        restored, at_step, _ = restore_checkpoint(
            path,
            target={
                "ae": jax.device_get(state),
                "opt_state": jax.device_get(opt_state),
            },
        )
        print(f"[guard] restored {path} (step {at_step})")
        return restored["ae"], restored["opt_state"]

    guard = CheckpointGuard(restore_latest)
    try:
        for step in range(1, cfg.max_steps + 1):
            state, opt_state, loss, recon, ok = step_fn(
                state, opt_state, next(batches)
            )
            if step % cfg.log_interval == 0 or step == 1:
                accepted = bool(ok) or not cfg.nan_guard
                if not accepted:
                    print(f"{step}: step REJECTED (non-finite loss/grads)")
                restored = guard.record(accepted, step)
                if restored is not None:
                    state, opt_state = restored
                logger.log(step, loss=float(loss), lr=lr_of(step))
                print(f"step {step}: loss {float(loss):.4f}")
            if cfg.checkpoint_interval and step % cfg.checkpoint_interval == 0:
                path = _save_ae_ckpt(
                    cfg, step, ae, state, {"opt_state": opt_state}
                )
                save_image(
                    np.asarray(jax.device_get(recon))[:16],
                    f"{cfg.output_dir}/{cfg.name}_reconst_{step:07d}.png",
                )
                print("checkpoint:", path)
    finally:
        batches.close()
        logger.close()
    # include opt_state: restore_latest targets {'ae','opt_state'}, so a
    # final checkpoint without it would crash the guard's recovery path on
    # a re-run in the same output_dir
    path = _save_ae_ckpt(cfg, cfg.max_steps, ae, state, {"opt_state": opt_state})
    print("final checkpoint:", path)
    return state, path


# ---------------------------------------------------------------------------
# stage 2: train_som
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TrainSomConfig:
    """Flags mirror som-diffusion/train_som.py:20-54."""

    manual_seed: int = 42
    platform: str = ""
    batch_size: int = 96
    ae_checkpoint: str = ""

    som_width: int = 0  # 0 = keep checkpoint size
    som_height: int = 0
    adapt_batch_size: int = 32
    sigma_begin: float = 64.0
    sigma_end: float = 0.1
    eta_begin: float = 0.5
    eta_end: float = 0.05
    nan_guard: bool = True  # reject non-finite SOM adaption steps
    max_steps: int = 10000

    dataset: str = "synthetic"
    image_size: int = 64
    file_list_fn: str = "file_list.json"
    image_dir_path: str = ""
    image_fn_regex: str = r".*\.png$"

    checkpoint_interval: int = 2000
    log_interval: int = 25
    wandb: bool = False
    project: str = "som-diffusion"
    tags: str = ""
    name: str = "som"
    output_dir: str = "outputs/som"


def train_som(cfg: TrainSomConfig):
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    if not cfg.ae_checkpoint:
        raise ValueError("--ae_checkpoint is required")
    ae, state, _ = load_som_ae(cfg.ae_checkpoint, pass_through=True)
    key = jax.random.PRNGKey(cfg.manual_seed)
    if cfg.som_width or cfg.som_height:
        w = cfg.som_width or ae.som_width
        h = cfg.som_height or ae.som_height
        print(f"reinitializing SOM to {w}x{h}")
        ae, state = ae.resize_som(key, state, w, h)

    exp_decay_scale = math.log(cfg.sigma_end / cfg.sigma_begin)

    @jax.jit
    def adapt_step(state: SomTokenizerState, batch, eta, sigma):
        h = ae.encode_latent(state, batch)
        som, err = som_adapt(
            state.som, h, eta, sigma, adapt_batch_size=cfg.adapt_batch_size
        )
        ok = jnp.isfinite(err)
        if cfg.nan_guard:
            som = _reject_nonfinite(ok, state.som, som)
        return state.replace(som=som), err, ok

    batch_fn = _image_batch_fn(
        cfg.dataset, cfg.file_list_fn, cfg.image_dir_path, cfg.image_fn_regex,
        cfg.batch_size, cfg.image_size, cfg.manual_seed,
    )
    batches = PrefetchIterator(batch_fn, depth=2)
    logger = MetricLogger(cfg.output_dir, cfg.name, use_wandb=cfg.wandb,
                         project=cfg.project, config=config_to_dict(cfg))
    try:
        for step in range(1, cfg.max_steps + 1):
            progress = (step - 1) / cfg.max_steps
            eta = (
                cfg.eta_begin * (1.0 - progress) + progress * cfg.eta_end
            )  # linear decay (train_som.py:90)
            sigma = cfg.sigma_begin * math.exp(
                progress * exp_decay_scale
            )  # exponential decay (:94)
            batch = next(batches)
            state, err, ok = adapt_step(state, batch, eta, sigma)
            if step % cfg.log_interval == 0 or step == 1:
                if cfg.nan_guard and not bool(ok):
                    print(f"{step}: step REJECTED (non-finite SOM error)")
                logger.log(step, som_error=float(err), eta=eta, sigma=sigma)
                print(
                    f"{step}: som_error {float(err):.5f} eta {eta:.3f} "
                    f"sigma {sigma:.2f}"
                )
            if (cfg.checkpoint_interval and step % cfg.checkpoint_interval == 0) or step == cfg.max_steps:
                path = _save_ae_ckpt(cfg2_for_save(cfg, ae), step, ae, state)
                recon, _h, _d, _ = ae.forward(state, jnp.asarray(batch), train=False)
                save_image(
                    np.asarray(jax.device_get(recon))[:16],
                    f"{cfg.output_dir}/{cfg.name}_som_{step:07d}.png",
                )
                print("checkpoint:", path)
    finally:
        batches.close()
        logger.close()
    return state, path


def cfg2_for_save(cfg, ae: SomAutoEncoder):
    """train_som checkpoints must rehydrate the AE: carry its geometry."""
    carrier = TrainAeConfig(
        embedding_dim=ae.embedding_dim,
        downscale_steps=ae.downscale_steps,
        hidden_planes=ae.hidden_planes,
        output_dir=cfg.output_dir,
        name=cfg.name,
    )
    return carrier


# ---------------------------------------------------------------------------
# stage 3: finetune_ae
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FinetuneAeConfig:
    """Flags mirror som-diffusion/finetune_ae.py:129-164."""

    manual_seed: int = 0
    platform: str = ""
    batch_size: int = 96
    optimizer: str = "AdamW"
    lr: float = 1e-4
    loss_fn: str = "SmoothL1"
    nan_guard: bool = True  # reject non-finite steps; auto-restore on streaks
    max_steps: int = 10000
    lr_decay_interval: int = 3000

    som_checkpoint: str = ""
    som_adapt_rate: float = 0.02
    som_adapt_radius: float = 0.25
    som_adapt_batch: int = 8
    som_adapt_skip: int = 0
    latent_loss_weight: float = 0.25

    dataset: str = "synthetic"
    image_size: int = 64
    file_list_fn: str = "file_list.json"
    image_dir_path: str = ""
    image_fn_regex: str = r".*\.png$"

    checkpoint_interval: int = 2500
    log_interval: int = 50
    wandb: bool = False
    project: str = "finetune_ae"
    tags: str = ""
    name: str = "finetune_ae"
    output_dir: str = "outputs/finetune_ae"


def finetune_ae(cfg: FinetuneAeConfig):
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    if not cfg.som_checkpoint:
        raise ValueError("--som_checkpoint is required")
    ae, state, base_cfg = load_som_ae(cfg.som_checkpoint, pass_through=True)
    loss_fn = _recon_loss(cfg.loss_fn)

    schedule = step_decay_schedule(
        cfg.lr, steps_per_epoch=cfg.lr_decay_interval, epoch_step_size=1
    )
    lr_of = host_schedule(schedule)  # log-point lr reads: no device RPC
    opt = make_optimizer(cfg.optimizer, schedule)
    opt_state = opt.init(state.params)
    adapt_interval = cfg.som_adapt_skip + 1

    @partial(jax.jit, donate_argnums=(0, 1), static_argnames=("adapt",))
    def step_fn(state, opt_state, batch, adapt: bool):
        def loss(params):
            st = state.replace(params=params)
            recon, h_in, h_diff, new_state = ae.forward(st, batch, train=True)
            l = loss_fn(recon, batch) + cfg.latent_loss_weight * h_diff
            return l, (new_state, h_in, recon)

        (l, (new_state, h_in, recon)), grads = jax.value_and_grad(
            loss, has_aux=True
        )(state.params)
        gn = optax.global_norm(grads)
        old = (state, opt_state)
        updates, opt_state = opt.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = new_state.replace(params=params)
        som_loss = jnp.float32(0)
        if adapt:
            som, som_loss = som_adapt(
                new_state.som,
                jax.lax.stop_gradient(h_in),
                cfg.som_adapt_rate,
                cfg.som_adapt_radius,
                adapt_batch_size=cfg.som_adapt_batch,
            )
            new_state = new_state.replace(som=som)
        ok = jnp.isfinite(l) & jnp.isfinite(gn) & jnp.isfinite(som_loss)
        if cfg.nan_guard:
            new_state, opt_state = _reject_nonfinite(
                ok, old, (new_state, opt_state)
            )
        return new_state, opt_state, l, som_loss, recon, ok

    batch_fn = _image_batch_fn(
        cfg.dataset, cfg.file_list_fn, cfg.image_dir_path, cfg.image_fn_regex,
        cfg.batch_size, cfg.image_size, cfg.manual_seed,
    )
    batches = PrefetchIterator(batch_fn, depth=2)
    logger = MetricLogger(cfg.output_dir, cfg.name, use_wandb=cfg.wandb,
                         project=cfg.project, config=config_to_dict(cfg))
    def restore_latest():
        # interval checkpoints carry only the AE state (reference contract);
        # on restore the optimizer state is kept as-is
        path = latest_checkpoint(cfg.output_dir) or cfg.som_checkpoint
        if not path:
            return None
        _ae, restored, _cfg = load_som_ae(path, pass_through=True)
        print(f"[guard] restored {path}")
        return restored

    guard = CheckpointGuard(restore_latest)
    try:
        for step in range(1, cfg.max_steps + 1):
            adapt = cfg.som_adapt_rate > 0 and step % adapt_interval == 0
            state, opt_state, loss, som_loss, recon, ok = step_fn(
                state, opt_state, next(batches), adapt
            )
            if step % cfg.log_interval == 0 or step == 1:
                accepted = bool(ok) or not cfg.nan_guard
                if not accepted:
                    print(f"{step}: step REJECTED (non-finite loss/grads)")
                restored = guard.record(accepted, step)
                if restored is not None:
                    state = restored
                logger.log(
                    step, loss=float(loss), som_loss=float(som_loss),
                    lr=lr_of(step),
                )
                print(
                    f"{step}: loss {float(loss):.4f} "
                    f"som_loss {float(som_loss):.4f}"
                )
            if cfg.checkpoint_interval and step % cfg.checkpoint_interval == 0:
                carrier = cfg2_for_save(cfg, ae)
                path = _save_ae_ckpt(carrier, step, ae, state)
                save_image(
                    np.asarray(jax.device_get(recon))[:16],
                    f"{cfg.output_dir}/{cfg.name}_reconst_{step:07d}.png",
                )
                print("checkpoint:", path)
    finally:
        batches.close()
        logger.close()
    carrier = cfg2_for_save(cfg, ae)
    path = _save_ae_ckpt(carrier, cfg.max_steps, ae, state)
    print("final checkpoint:", path)
    return state, path


# ---------------------------------------------------------------------------
# stage 4: create_diffusion_dataset
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class CreateDatasetConfig:
    """Flags mirror som-diffusion/create_diffusion_dataset.py:13-29."""

    manual_seed: int = 42
    platform: str = ""
    batch_size: int = 96
    checkpoint: str = ""
    dataset_fn: str = "diffusion_dataset.npz"
    max_examples: int = -1

    dataset: str = "synthetic"
    image_size: int = 64
    file_list_fn: str = "file_list.json"
    image_dir_path: str = ""
    image_fn_regex: str = r".*\.png$"


def create_diffusion_dataset(cfg: CreateDatasetConfig):
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    if not cfg.checkpoint:
        raise ValueError("--checkpoint is required")
    ae, state, ae_config = load_som_ae(cfg.checkpoint, pass_through=True)
    encode = jax.jit(lambda batch: ae.encode_2d(state, batch))

    batch_fn = _image_batch_fn(
        cfg.dataset, cfg.file_list_fn, cfg.image_dir_path, cfg.image_fn_regex,
        cfg.batch_size, cfg.image_size, cfg.manual_seed,
    )
    n_target = cfg.max_examples if cfg.max_examples > 0 else 10_000
    chunks = []
    count = 0
    while count < n_target:
        h = encode(jnp.asarray(batch_fn()))  # noqa: B023 — state is fixed
        chunks.append(np.asarray(jax.device_get(h)))
        count += chunks[-1].shape[0]
    data = np.concatenate(chunks)[:n_target]
    print("encoded latents:", data.shape)
    os.makedirs(os.path.dirname(cfg.dataset_fn) or ".", exist_ok=True)
    np.savez(cfg.dataset_fn, data=data, config=np.array(
        [str(ae_config)], dtype=object
    ))
    import json

    with open(cfg.dataset_fn + ".json", "w") as f:
        json.dump(ae_config, f)
    print("written:", cfg.dataset_fn)
    return data


# ---------------------------------------------------------------------------
# stage 5: train_diffusion
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class TrainDiffusionConfig:
    """Flags mirror som-diffusion/train_diffusion.py:175-211."""

    manual_seed: int = 42
    platform: str = ""
    batch_size: int = 128
    optimizer: str = "AdamW"
    lr: float = 1e-4
    loss_fn: str = "MSE"
    nan_guard: bool = True  # reject non-finite steps; auto-restore on streaks
    accumulation_steps: int = 1
    checkpoint_interval: int = 25000
    eval_interval: int = 2000
    eval_timesteps: int = 1000
    eval_batch_size: int = 8
    eval_trace_steps: int = 20

    weight_decay: float = 0.0
    dropout: float = 0.0
    model_channels: int = 128
    num_res_blocks: int = 3
    channel_mult: Tuple[int, ...] = (1, 2, 3)

    input_dataset: str = "diffusion_dataset.npz"
    firstn: int = -1
    decoder_model: str = ""
    warmup: int = 500
    max_steps: int = 200_000
    single_batch: bool = False
    ema_decay: float = 0.9999
    log_interval: int = 10

    wandb: bool = False
    project: str = "som-diffusion-diffusion"
    tags: str = ""
    name: str = "diffusion"
    output_dir: str = "outputs/som_diffusion"


def train_diffusion(cfg: TrainDiffusionConfig):
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    if not cfg.decoder_model:
        raise ValueError("--decoder_model (som AE checkpoint) is required")
    data = np.load(cfg.input_dataset, allow_pickle=True)["data"]
    if cfg.firstn > 0:
        data = data[: cfg.firstn]
    print("dataset:", data.shape)
    ae, ae_state, _ = load_som_ae(cfg.decoder_model, pass_through=True)

    model = UNetDiffusionModel(
        in_channels=2,
        out_channels=2,
        model_channels=cfg.model_channels,
        num_res_blocks=cfg.num_res_blocks,
        channel_mult=tuple(cfg.channel_mult),
        dropout=cfg.dropout,
    )
    key = jax.random.PRNGKey(cfg.manual_seed)
    latent_shape = data.shape[1:]
    params = model.init(
        key, jnp.zeros((1,) + latent_shape), jnp.zeros((1, 1))
    )["params"]
    print(
        "parameters:",
        f"{sum(x.size for x in jax.tree_util.tree_leaves(params)):,}",
    )

    loss_fn = _recon_loss(cfg.loss_fn)
    schedule = warmup_cosine_schedule(cfg.lr, cfg.warmup, cfg.max_steps)
    lr_of = host_schedule(schedule)  # log-point lr reads: no device RPC
    opt = make_optimizer(cfg.optimizer, schedule, cfg.weight_decay)
    if cfg.accumulation_steps > 1:
        opt = optax.MultiSteps(opt, cfg.accumulation_steps)
    opt_state = opt.init(params)
    ema_params = ema_init(params) if cfg.ema_decay > 0 else None

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def step_fn(params, ema_params, opt_state, batch, key):
        k_t, k_n, k_drop = jax.random.split(key, 3)
        b = batch.shape[0]
        t = jax.random.uniform(k_t, (b, 1))
        xt, eps = ddpm_corrupt(k_n, batch, t)

        def loss(p):
            pred = model.apply(
                {"params": p}, xt, t, train=True, rngs={"dropout": k_drop}
            )
            return loss_fn(pred, eps)

        l, grads = jax.value_and_grad(loss)(params)
        gn = optax.global_norm(grads)
        old = (params, ema_params, opt_state)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if ema_params is not None:
            ema_params = ema_update(ema_params, params, cfg.ema_decay)
        ok = jnp.isfinite(l) & jnp.isfinite(gn)
        if cfg.nan_guard:
            params, ema_params, opt_state = _reject_nonfinite(
                ok, old, (params, ema_params, opt_state)
            )
        return params, ema_params, opt_state, l, gn, ok

    def run_eval(p, tag, step):
        eps_fn = lambda x, t: model.apply({"params": p}, x, t)
        trace = ddpm_sample(
            jax.random.PRNGKey(step),
            eps_fn,
            (cfg.eval_batch_size,) + latent_shape,
            timesteps=cfg.eval_timesteps,
            trace_steps=cfg.eval_trace_steps,
        )
        # decode every trace row (train_diffusion.py:163-170)
        latents = trace.reshape(-1, *latent_shape)
        imgs = np.asarray(jax.device_get(ae.decode_2d(ae_state, latents)))
        grid = make_grid(imgs, nrow=cfg.eval_batch_size)
        fn = f"{cfg.output_dir}/{cfg.name}_sampling_{step:07d}_{tag}.png"
        save_image(grid, fn)
        print("eval artifact:", fn)

    rng = np.random.default_rng(cfg.manual_seed)
    logger = MetricLogger(cfg.output_dir, cfg.name, use_wandb=cfg.wandb,
                         project=cfg.project, config=config_to_dict(cfg))
    fixed = data[rng.integers(0, len(data), cfg.batch_size)]

    def restore_latest():
        path = latest_checkpoint(cfg.output_dir)
        if not path:
            return None
        target = {
            "params": jax.device_get(params),
            "ema": jax.device_get(ema_params)
            if ema_params is not None
            else {},
            "opt_state": jax.device_get(opt_state),
        }
        restored, at_step, _ = restore_checkpoint(path, target)
        print(f"[guard] restored {path} (step {at_step})")
        return (
            restored["params"],
            restored["ema"] if ema_params is not None else None,
            restored["opt_state"],
        )

    guard = CheckpointGuard(restore_latest)
    try:
        for step in range(1, cfg.max_steps + 1):
            if cfg.single_batch:
                batch = fixed
            else:
                batch = data[rng.integers(0, len(data), cfg.batch_size)]
            key, sub = jax.random.split(key)
            params, ema_params, opt_state, loss, gn, ok = step_fn(
                params, ema_params, opt_state, jnp.asarray(batch), sub
            )
            if step % cfg.log_interval == 0 or step == 1:
                accepted = bool(ok) or not cfg.nan_guard
                if not accepted:
                    print(f"{step}: step REJECTED (non-finite loss/grads)")
                restored = guard.record(accepted, step)
                if restored is not None:
                    params, ema_params, opt_state = restored
                logger.log(step, loss=float(loss), grad_norm=float(gn),
                           lr=lr_of(step))
                print(f"{step}: loss {float(loss):.3e} gn {float(gn):.2e}")
            if cfg.checkpoint_interval and step % cfg.checkpoint_interval == 0:
                path = save_checkpoint(
                    cfg.output_dir, step,
                    {
                        "params": params,
                        "ema": ema_params if ema_params is not None else {},
                        "opt_state": opt_state,
                    },
                    config_to_dict(cfg),
                )
                print("checkpoint:", path)
            if cfg.eval_interval and step % cfg.eval_interval == 0:
                run_eval(params, "base", step)
                if ema_params is not None:
                    run_eval(ema_params, "ema", step)
    finally:
        logger.close()
    return params


# CLI wrappers ---------------------------------------------------------------


def main_train_ae(argv=None):
    train_ae(dataclass_cli(TrainAeConfig, argv))


def main_train_som(argv=None):
    train_som(dataclass_cli(TrainSomConfig, argv))


def main_finetune_ae(argv=None):
    finetune_ae(dataclass_cli(FinetuneAeConfig, argv))


def main_create_dataset(argv=None):
    create_diffusion_dataset(dataclass_cli(CreateDatasetConfig, argv))


def main_train_diffusion(argv=None):
    train_diffusion(dataclass_cli(TrainDiffusionConfig, argv))
