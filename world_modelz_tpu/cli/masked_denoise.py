"""Masked-denoise prototype: gMLP over patch-VQ tokens.

Parity with vq-video-diffusion/masked_denoise_prototype/main.py: (1) fit
per-level patch vector quantizers (a VectorQuantizerEMA over flattened
p x p x 3 patch vectors per pyramid level, `train_vq_models`), then (2) train
a gMLP to denoise masked token grids of one level, with named cosine-power
noise schedules (:323-337), VQ-embedding input projection with a zero mask
embedding (:167-171 + vectorquantizer.py:24-28), iterative-unmask evaluation
producing a denoising-trace image (:229-296), and per-diffusion-time loss
curves (:300-321, matplotlib).

Images are in [-1, 1] like the reference's SetRange transform (:193).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from world_modelz_tpu.data import FileListImageDataset
from world_modelz_tpu.data.images import load_file_list
from world_modelz_tpu.data.trajectory import SyntheticTrajectorySource
from world_modelz_tpu.diffusion.masked import top_k_logits
from world_modelz_tpu.diffusion.schedules import named_schedule
from world_modelz_tpu.models.gmlp import GMLP
from world_modelz_tpu.ops.vq import (
    VQState,
    vq_apply,
    vq_decode,
    vq_decode_masked,
    vq_encode,
    vq_init,
)
from world_modelz_tpu.train import CheckpointGuard, make_optimizer
from world_modelz_tpu.train.checkpoint import (
    AsyncCheckpointSaver,
    latest_checkpoint,
    restore_checkpoint,
    save_checkpoint,
)
from world_modelz_tpu.utils import MetricLogger, dataclass_cli, make_grid, save_image
from world_modelz_tpu.utils.config import config_to_dict


def patchify(images: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, N, patch*patch*C) patch vectors (the reference's
    Rearrange 'b c (h p1) (w p2) -> b (h w) c p1 p2', main.py:186)."""
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch * patch * c)


def unpatchify(patches: jnp.ndarray, patch: int, grid: int, c: int = 3):
    """(B, N, patch*patch*C) -> (B, H, W, C)."""
    b = patches.shape[0]
    x = patches.reshape(b, grid, grid, patch, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, grid * patch, grid * patch, c)


@dataclasses.dataclass
class MaskedDenoiseConfig:
    """Mirrors the hard-coded config block (main.py:153-165) as flags."""

    manual_seed: int = 0
    platform: str = ""
    batch_size: int = 14
    lr: float = 5e-4
    weight_decay: float = 1e-7
    nan_guard: bool = True  # reject non-finite steps; auto-restore on streaks
    d_model: int = 512
    depth: int = 5
    schedule_name: str = "cos3_inv"
    level: int = 5  # pyramid level: patch = image_size / 2^level
    p_max_uniform: float = 0.1
    independent_uniform: bool = False
    codebook_size: int = 256

    image_size: int = 64
    dataset: str = "synthetic"  # synthetic|files
    file_list_fn: str = "file_list.json"
    image_dir_path: str = ""
    image_fn_regex: str = r".*\.(png|jpg)$"

    vq_steps: int = 300  # patch-VQ fitting steps
    max_steps: int = 10000
    eval_interval: int = 1000
    eval_batch_size: int = 24
    num_eval_iterations: int = 25
    sample_topk: int = -1
    checkpoint_interval: int = 5000
    log_interval: int = 10

    name: str = "masked_denoise"
    output_dir: str = "outputs/masked_denoise"
    wandb: bool = False
    project: str = "masked_denoise"
    tags: str = ""


def _batch_fn(cfg: MaskedDenoiseConfig, seed: int):
    rng = np.random.default_rng(seed)
    if cfg.dataset == "files":
        files = load_file_list(
            cfg.file_list_fn, cfg.image_dir_path, cfg.image_fn_regex
        )
        ds = FileListImageDataset(files, cfg.batch_size, seed=seed)
        return lambda n=None: ds.next_batch() * 2.0 - 1.0
    src = SyntheticTrajectorySource(
        num_trajectories=32, traj_frames=64, frame_size=cfg.image_size,
        seed=seed,
    )
    frames = np.concatenate(
        [np.stack(list(src.load_frames(n))) for n in src.trajectory_names()]
    ).astype(np.float32) / 127.5 - 1.0

    def sample(n=None):
        return frames[rng.integers(0, len(frames), n or cfg.batch_size)]

    return sample


def fit_patch_vq(
    cfg: MaskedDenoiseConfig, batch_fn, patch: int, key
) -> VQState:
    """Fit a VectorQuantizerEMA on patch vectors (train_vq_models)."""
    d = 3 * patch * patch
    state = vq_init(
        key, num_latents=1, num_embeddings=cfg.codebook_size,
        embedding_dim=d,
    )

    @jax.jit
    def step(state, images):
        vecs = patchify(images, patch).reshape(-1, 1, d)
        out, state = vq_apply(state, vecs, train=True)
        return state, out.perplexity

    for i in range(cfg.vq_steps):
        state, ppl = step(state, jnp.asarray(batch_fn()))
    print(f"patch VQ fitted: patch={patch} perplexity={float(ppl):.1f}")
    return state


def train(cfg: MaskedDenoiseConfig):
    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    patch = cfg.image_size // (2**cfg.level)
    grid = cfg.image_size // patch
    seq_len = grid * grid
    num_tokens = cfg.codebook_size
    mask_token = num_tokens
    d_patch = 3 * patch * patch
    schedule = named_schedule(cfg.schedule_name)

    key = jax.random.PRNGKey(cfg.manual_seed)
    batch_fn = _batch_fn(cfg, cfg.manual_seed)

    k_vq, k_model, key = jax.random.split(key, 3)
    vq_state = fit_patch_vq(cfg, batch_fn, patch, k_vq)

    model = GMLP(
        num_tokens_in=num_tokens + 1,
        num_tokens_out=num_tokens,
        dim=cfg.d_model,
        depth=cfg.depth,
        seq_len=seq_len,
        vq_embedding_dim=d_patch,
    )
    params = model.init(
        k_model,
        jnp.zeros((1, seq_len), jnp.int32),
        jnp.zeros((1, seq_len, d_patch)),
    )["params"]
    print(
        "parameters:",
        f"{sum(x.size for x in jax.tree_util.tree_leaves(params)):,}",
    )

    opt = make_optimizer(
        "adamw",
        optax.exponential_decay(cfg.lr, 25000, 0.5, staircase=True),
        cfg.weight_decay,
    )
    opt_state = opt.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, images, key):
        b = images.shape[0]
        k_r, k_mask, k_resample, k_uni, k_r2 = jax.random.split(key, 5)
        vecs = patchify(images, patch).reshape(-1, 1, d_patch)
        encoding = vq_encode(vq_state, vecs.reshape(-1, d_patch)[:, None, :])
        encoding = encoding.reshape(b, seq_len)

        r = schedule(jax.random.uniform(k_r, (b, 1)))
        mask = jax.random.uniform(k_mask, (b, seq_len)) < r
        r_pert = (
            jax.random.uniform(k_r2, (b, 1))
            if cfg.independent_uniform
            else r
        )
        resample = (
            jax.random.uniform(k_resample, (b, seq_len))
            < r_pert * cfg.p_max_uniform
        )
        uniform_draw = jax.random.randint(k_uni, (b, seq_len), 0, num_tokens)
        draw = jnp.where(resample, uniform_draw, encoding)
        inp = jnp.where(mask, mask_token, draw)

        vq_embedding = vq_decode_masked(
            vq_state, inp[..., None], mask_token
        ).reshape(b, seq_len, d_patch)

        def loss_fn(p):
            logits = model.apply(
                {"params": p}, inp, jax.lax.stop_gradient(vq_embedding)
            )
            ce = optax.softmax_cross_entropy_with_integer_labels(
                logits.reshape(-1, num_tokens), encoding.reshape(-1)
            )
            return ce.mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        gn = optax.global_norm(grads)
        old = (params, opt_state)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # failure detection: reject the whole step on a non-finite loss/grad
        # (train/guard.py semantics, on-device — no per-step host sync)
        ok = jnp.isfinite(loss) & jnp.isfinite(gn)
        if cfg.nan_guard:
            from world_modelz_tpu.train.guard import reject_nonfinite

            params, opt_state = reject_nonfinite(ok, old, (params, opt_state))
        return params, opt_state, loss, ok

    def evaluate(params, step):
        """Iterative unmask with a per-iteration decode trace
        (main.py:229-296)."""
        b = cfg.eval_batch_size
        eval_schedule = lambda f: f**2  # eval_noise_schedule (main.py:130)
        key = jax.random.PRNGKey(step)
        logits = jnp.zeros((b, seq_len, num_tokens))
        traces = []
        denoised = None
        for i in range(cfg.num_eval_iterations):
            key, k_draw, k_mask = jax.random.split(key, 3)
            lg = logits.reshape(-1, num_tokens)
            if cfg.sample_topk > 0:
                lg = top_k_logits(lg, cfg.sample_topk)
            denoised = jax.random.categorical(k_draw, lg).reshape(b, seq_len)
            frac = (i + 1) / cfg.num_eval_iterations
            alpha = min(float(eval_schedule(frac)), 1.0)
            mask = jax.random.uniform(k_mask, (b, seq_len)) > alpha
            sample = jnp.where(mask, mask_token, denoised)

            dec = vq_decode(vq_state, denoised[..., None]).reshape(
                b, seq_len, d_patch
            )
            traces.append(
                np.asarray(
                    (unpatchify(dec, patch, grid) + 1.0) * 0.5
                )
            )
            vq_embedding = vq_decode_masked(
                vq_state, sample[..., None], mask_token
            ).reshape(b, seq_len, d_patch)
            logits = model.apply({"params": params}, sample, vq_embedding)

        trace = np.concatenate(traces)
        fn = f"{cfg.output_dir}/{cfg.name}_eval_{step:07d}.png"
        save_image(make_grid(trace, nrow=b), fn)
        print("eval artifact:", fn)

    logger = MetricLogger(cfg.output_dir, cfg.name, use_wandb=cfg.wandb,
                         project=cfg.project, config=config_to_dict(cfg))

    saver = AsyncCheckpointSaver()

    def restore_latest():
        saver.wait()  # an in-flight async save must land first
        path = latest_checkpoint(cfg.output_dir)
        if not path:
            return None
        restored, at_step, _ = restore_checkpoint(
            path,
            target={
                "params": jax.device_get(params),
                "vq": jax.device_get(vq_state),
                "opt_state": jax.device_get(opt_state),
            },
        )
        print(f"[guard] restored {path} (step {at_step})")
        return restored["params"], restored["opt_state"]

    guard = CheckpointGuard(restore_latest)
    # device scalars, read back once at the end — no per-step host sync
    loss_log = []
    try:
        for step in range(1, cfg.max_steps + 1):
            key, sub = jax.random.split(key)
            params, opt_state, loss, ok = train_step(
                params, opt_state, jnp.asarray(batch_fn()), sub
            )
            loss_log.append(loss)
            if step % cfg.log_interval == 0 or step == 1:
                accepted = bool(ok) or not cfg.nan_guard
                if not accepted:
                    print(f"{step}: step REJECTED (non-finite loss/grads)")
                restored = guard.record(accepted, step)
                if restored is not None:
                    params, opt_state = restored
                logger.log(step, loss=float(loss))
                print(f"{step}: loss {float(loss):.4f}")
            if cfg.eval_interval and step % cfg.eval_interval == 0:
                evaluate(params, step)
            if cfg.checkpoint_interval and step % cfg.checkpoint_interval == 0:
                path = saver.save(
                    cfg.output_dir, step,
                    {"params": params, "vq": vq_state, "opt_state": opt_state},
                    config_to_dict(cfg),
                )
                print("checkpoint:", path)
        # one stacked transfer — per-element float() would be one RPC round
        # trip per training step on a relayed TPU backend
        _plot_loss(cfg, np.asarray(jnp.stack(loss_log)).tolist())
    finally:
        try:
            saver.wait()  # the last async save must land before exit
        except Exception as e:
            print("[checkpoint] async save failed:", e)
        logger.close()
    return params, vq_state


def _plot_loss(cfg, loss_log):
    """Log-scale CE curve (main.py:300-321)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(8, 8))
        ax.plot(loss_log)
        ax.set_yscale("log")
        ax.set_title("Cross Entropy")
        ax.set_xlabel("iteration")
        os.makedirs(cfg.output_dir, exist_ok=True)
        fig.savefig(f"{cfg.output_dir}/{cfg.name}_plot.png", format="png")
        plt.close(fig)
    except Exception as e:
        print("loss plot skipped:", e)


def main(argv=None):
    cfg = dataclass_cli(MaskedDenoiseConfig, argv)
    print("Config:", cfg)
    train(cfg)


if __name__ == "__main__":
    main()
