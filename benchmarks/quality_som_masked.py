"""Quantitative acceptance for the SOM-DDPM and masked-denoise families.

VERDICT r4 #7: both families train on the TPU (round-4 artifacts) but
their evidence was loss-curves-and-PNGs only. This script scores trained
checkpoints with numbers that can regress-check:

SOM-DDPM (reference pipeline som-diffusion/experiments/ds2/README.md:8-27):
  Fréchet distance between DDPM-sampled images and the training
  distribution, in the deterministic tiny feature space (utils/fvd tiny
  extractor on 1-frame clips — an FID-style score with the same fixed
  random-projection features the video trend uses), with a bootstrap CI
  and a real-vs-real noise floor. BOTH sides are decoded by the SAME
  finetuned AE (generated: sampled latents -> decode_2d; real: dataset
  latents -> decode_2d), isolating the diffusion model from AE recon
  quality.

Masked-denoise (reference vq-video-diffusion/masked_denoise_prototype/
main.py): reconstruction PSNR/SSIM. Held-out images are patch-VQ encoded,
a fraction of tokens is masked, the trained gMLP iteratively unmasks with
visible tokens CLAMPED, and the decoded reconstruction is scored against
(a) the original image and (b) the patch-VQ roundtrip (the model's
ceiling: it can at best emit the right tokens).

    python benchmarks/quality_som_masked.py \
        [--som_diff outputs/r4_som/diff/step_0003000] \
        [--masked outputs/r4/masked/step_0004000] \
        [--out artifacts/round5/som_masked_quality.json]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def score_som(ckpt: str, n: int, seed: int) -> dict:
    import jax
    import jax.numpy as jnp

    from world_modelz_tpu.cli.som_pipeline import (
        TrainDiffusionConfig,
        load_som_ae,
    )
    from world_modelz_tpu.diffusion.ddpm import ddpm_sample
    from world_modelz_tpu.models.unet import UNetDiffusionModel
    from world_modelz_tpu.train.checkpoint import restore_checkpoint
    from world_modelz_tpu.utils import fvd as F
    from world_modelz_tpu.utils.config import config_from_dict

    state, step, config = restore_checkpoint(ckpt)
    cfg = config_from_dict(TrainDiffusionConfig, config)
    params = state.get("ema") or state["params"]
    ae, ae_state, _ = load_som_ae(cfg.decoder_model, pass_through=True)
    data = np.load(
        os.path.join(ROOT, cfg.input_dataset)
        if not os.path.isabs(cfg.input_dataset)
        and not os.path.exists(cfg.input_dataset)
        else cfg.input_dataset,
        allow_pickle=True,
    )["data"]
    latent_shape = data.shape[1:]

    model = UNetDiffusionModel(
        in_channels=2, out_channels=2, model_channels=cfg.model_channels,
        num_res_blocks=cfg.num_res_blocks,
        channel_mult=tuple(cfg.channel_mult), dropout=0.0,
    )
    eps_fn = lambda x, t: model.apply({"params": params}, x, t)
    trace = ddpm_sample(
        jax.random.PRNGKey(seed), eps_fn, (n,) + latent_shape,
        timesteps=cfg.eval_timesteps, trace_steps=2,
    )
    gen_lat = trace[-1]

    rng = np.random.default_rng(seed)
    real_lat_a = jnp.asarray(data[rng.integers(0, len(data), n)])
    real_lat_b = jnp.asarray(data[rng.integers(0, len(data), n)])

    def decode(lat):
        return np.asarray(jax.device_get(ae.decode_2d(ae_state, lat)))

    gen = np.clip(decode(gen_lat), 0.0, 1.0)
    real_a = np.clip(decode(real_lat_a), 0.0, 1.0)
    real_b = np.clip(decode(real_lat_b), 0.0, 1.0)

    feats = {
        k: F.tiny_video_features(jnp.asarray(v[:, None]))  # (B,1,H,W,C)
        for k, v in {"gen": gen, "a": real_a, "b": real_b}.items()
    }
    floor, flo, fhi = F.fvd_bootstrap(feats["a"], feats["b"])
    fid, lo, hi = F.fvd_bootstrap(feats["a"], feats["gen"])
    return {
        "checkpoint": ckpt, "step": int(step), "samples": n,
        "timesteps": cfg.eval_timesteps,
        "frechet_gen_vs_train": {"fid": fid, "ci95": [lo, hi]},
        "noise_floor_train_vs_train": {"fid": floor, "ci95": [flo, fhi]},
        "note": (
            "tiny-extractor (1-frame) Fréchet; both sides decoded by the "
            "finetuned AE so the score isolates the DDPM over SOM latents"
        ),
    }


def score_masked(ckpt: str, n: int, seed: int, iters: int = 12) -> dict:
    import jax
    import jax.numpy as jnp

    from world_modelz_tpu.cli.masked_denoise import (
        MaskedDenoiseConfig,
        _batch_fn,
        patchify,
        unpatchify,
    )
    from world_modelz_tpu.models.gmlp import GMLP
    from world_modelz_tpu.ops.vq import vq_decode, vq_encode
    from world_modelz_tpu.train.checkpoint import restore_checkpoint
    from world_modelz_tpu.utils.config import config_from_dict
    from world_modelz_tpu.utils.metrics import psnr, ssim
    from world_modelz_tpu.ops.vq import vq_decode_masked

    from world_modelz_tpu.ops.vq import VQState

    state, step, config = restore_checkpoint(ckpt)
    cfg = config_from_dict(MaskedDenoiseConfig, config)
    params, vq_state = state["params"], state["vq"]
    if not isinstance(vq_state, VQState):  # untargeted orbax restore
        vq_state = VQState(**{
            k: jnp.asarray(vq_state[k])
            for k in ("codebook", "cluster_size", "activation_count",
                      "accumulated_error")
        })

    patch = cfg.image_size // (2**cfg.level)
    grid = cfg.image_size // patch
    seq_len = grid * grid
    num_tokens = cfg.codebook_size
    mask_token = num_tokens
    d_patch = 3 * patch * patch

    model = GMLP(
        num_tokens_in=num_tokens + 1, num_tokens_out=num_tokens,
        dim=cfg.d_model, depth=cfg.depth, seq_len=seq_len,
        vq_embedding_dim=d_patch,
    )

    # held-out images: a seed the trainer never used
    images = jnp.asarray(_batch_fn(cfg, seed + 7919)(n))
    vecs = patchify(images, patch).reshape(-1, 1, d_patch)
    tokens = vq_encode(vq_state, vecs[:, 0, None, :]).reshape(n, seq_len)
    roundtrip = unpatchify(
        vq_decode(vq_state, tokens[..., None]).reshape(n, seq_len, d_patch),
        patch, grid,
    )

    def to01(x):
        return jnp.clip((x + 1.0) * 0.5, 0.0, 1.0)

    def reconstruct(frac, key):
        """Mask `frac` of tokens, iteratively unmask with visible clamped."""
        k_mask, key = jax.random.split(key)
        visible = jax.random.uniform(k_mask, (n, seq_len)) >= frac
        cur = jnp.where(visible, tokens, mask_token)
        for i in range(iters):
            emb = vq_decode_masked(
                vq_state, cur[..., None], mask_token
            ).reshape(n, seq_len, d_patch)
            logits = model.apply({"params": params}, cur, emb)
            pred = jnp.argmax(logits, axis=-1)
            # re-mask a shrinking fraction of the PREDICTED positions so
            # later iterations condition on earlier confident fills
            key, k_rem = jax.random.split(key)
            keep = (
                jax.random.uniform(k_rem, (n, seq_len))
                >= frac * (1.0 - (i + 1) / iters)
            )
            cur = jnp.where(
                visible, tokens, jnp.where(keep, pred, mask_token)
            )
        final = jnp.where(visible, tokens, pred)
        dec = unpatchify(
            vq_decode(vq_state, final[..., None]).reshape(
                n, seq_len, d_patch
            ),
            patch, grid,
        )
        return dec

    rows = {}
    key = jax.random.PRNGKey(seed)
    for frac in (0.25, 0.5, 0.75):
        key, k = jax.random.split(key)
        dec = reconstruct(frac, k)
        rows[f"mask_{int(frac*100)}pct"] = {
            "psnr_vs_original": round(
                float(psnr(to01(dec), to01(images)).mean()), 3
            ),
            "ssim_vs_original": round(
                float(ssim(to01(dec), to01(images)).mean()), 4
            ),
            "psnr_vs_vq_roundtrip": round(
                float(psnr(to01(dec), to01(roundtrip)).mean()), 3
            ),
        }
    ceiling = round(
        float(psnr(to01(roundtrip), to01(images)).mean()), 3
    )
    return {
        "checkpoint": ckpt, "step": int(step), "images": n,
        "unmask_iterations": iters,
        "vq_roundtrip_ceiling_psnr": ceiling,
        "reconstruction": rows,
        "note": (
            "held-out images, patch-VQ tokens masked at 25/50/75%, "
            "iterative unmask with visible tokens clamped; "
            "psnr_vs_vq_roundtrip scores token prediction against the "
            "model's ceiling (exact tokens)"
        ),
    }


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument(
        "--som_diff", default=os.path.join(
            ROOT, "outputs", "r4_som", "diff", "step_0003000"
        ),
    )
    p.add_argument(
        "--masked", default=os.path.join(
            ROOT, "outputs", "r4", "masked", "step_0004000"
        ),
    )
    p.add_argument("--samples", type=int, default=64)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--platform", default="")
    p.add_argument(
        "--out", default=os.path.join(
            ROOT, "artifacts", "round5", "som_masked_quality.json"
        ),
    )
    args = p.parse_args(argv)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    out = {"about": __doc__.split("\n")[0]}
    if args.som_diff and os.path.exists(args.som_diff):
        out["som"] = score_som(args.som_diff, args.samples, args.seed)
        print(json.dumps(out["som"], indent=1))
    if args.masked and os.path.exists(args.masked):
        out["masked"] = score_masked(args.masked, 24, args.seed)
        print(json.dumps(out["masked"], indent=1))
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print("->", args.out)


if __name__ == "__main__":
    main()
