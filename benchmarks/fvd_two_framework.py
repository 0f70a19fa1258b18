"""Two-framework FVD: the SAME trained weights sampled by BOTH frameworks.

The BASELINE.md north-star is "FVD parity with the PyTorch reference
within 1%". Every earlier round scored framework-generated clips against
*real* clips; this harness closes the literal comparison:

1. load a video-diffusion checkpoint trained HERE (tokenizer + denoiser),
2. export both weight sets into the reference torch classes
   (`utils/torch_export.py`, strict load),
3. run the REFERENCE'S OWN sampler — `evaluate_model` imported from
   /root/reference/vq-video-diffusion/main.py:51-124 — on CPU to generate
   reference-framework rollouts,
4. run OUR rollout (`diffusion.rollout_frames`, the sampler every trainer
   and the serving path use) from the same data distribution,
5. score both sets against a held-out REAL clip set — and against each
   other — with the calibrated feature extractor + bootstrap CIs
   (utils/fvd.py, artifacts/fvd_calibration.json).

    python benchmarks/fvd_two_framework.py --checkpoint <ckpt> \
        [--clips 64] [--iters 30] [--out artifacts/round4/two_framework_fvd.json]

Parity verdict: |FVD_ours - FVD_ref| / FVD_ref, plus the direct
ours-vs-ref distance against the real-vs-real noise floor.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import types

import numpy as np

REF = "/root/reference"
_REF_NAMES = (
    "train_vqae", "autoencoder", "vq", "local_3d_attention", "main",
    "transformer", "importance_sampling", "warmup_scheduler",
    "model_ema_v2", "buffered_traj_sampler", "sparse_diffusion",
    "data", "data.moving_mnist",
)


def _stub_module(name: str):
    if name in sys.modules:
        return
    mod = types.ModuleType(name)

    def _getattr(attr):
        if attr.startswith("__"):
            raise AttributeError(attr)
        return types.SimpleNamespace()

    mod.__getattr__ = _getattr
    sys.modules[name] = mod


def _import_ref(subdir: str, module: str):
    import importlib

    for n in _REF_NAMES:
        sys.modules.pop(n, None)
    sys.path.insert(0, os.path.join(REF, subdir))
    try:
        return importlib.import_module(module)
    finally:
        sys.path.pop(0)
        for n in _REF_NAMES:
            sys.modules.pop(n, None)


def _chunk_cache(cache_dir, name, chunk):
    return (
        os.path.join(cache_dir, f"{name}_{chunk:03d}.npz")
        if cache_dir else None
    )


def _load_chunk(path):
    if path and os.path.exists(path):
        return np.load(path)["clips"]
    return None


def _save_chunk(path, clips):
    if path:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        np.savez_compressed(path, clips=clips)


def _check_cache_meta(cache_dir, meta):
    """Validate the resume cache against run parameters (sidecar file).

    Caches are keyed by chunk index only, so a parameter change (different
    checkpoint/iters/seed) would silently score stale rollouts. A meta.json
    sidecar is written on first use and must match on resume; legacy caches
    without a sidecar adopt the current parameters (write-if-missing).

    The total `clips` count is excluded from the comparison: chunks are
    seeded per chunk index, so the first N chunks of a longer run are
    bit-identical to a shorter run's — a timed-out 32-clip run can be
    rescored at 8/16 clips from the same cache (and vice versa).
    """
    if not cache_dir:
        return
    os.makedirs(cache_dir, exist_ok=True)
    mpath = os.path.join(cache_dir, "meta.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            prev = json.load(f)
        ignore = {"clips"}
        prev_key = {k: v for k, v in prev.items() if k not in ignore}
        meta_key = {k: v for k, v in meta.items() if k not in ignore}
        if prev_key != meta_key:
            raise SystemExit(
                f"cache {cache_dir} was built with different parameters:\n"
                f"  cached: {prev}\n  now:    {meta}\n"
                "pass a fresh --cache_dir (or delete the stale cache)"
            )
    else:
        with open(mpath, "w") as f:
            json.dump(meta, f, indent=1)


def reference_rollouts(
    *, torch, ref_main, ref_model, ref_tok, dataset, n_clips, batch_size,
    num_frames, n_past, image_width, seed, cache_dir=None, on_chunk=None,
):
    """Run the reference's evaluate_model for n_clips, stacking its
    generated frames into (N, num_frames, H, W, 1) float arrays.

    Each batch-size chunk is cached to `cache_dir` so an interrupted run
    (the relay kills long processes) resumes instead of restarting.
    `on_chunk(clips_so_far)` fires after every chunk so the caller can
    emit a partial score — an interrupted run still yields a number.
    """
    import random

    clips = []
    done = 0
    chunk = 0
    while done < n_clips:
        b = min(batch_size, n_clips - done)
        cpath = _chunk_cache(cache_dir, "ref", chunk)
        gen = _load_chunk(cpath)
        if gen is None or gen.shape[0] != b:
            # evaluate_model draws its context via the global `random`
            # module and samples with torch's global generator — seed
            # both per chunk so caching never changes the stream
            random.seed(seed + chunk)
            torch.manual_seed(seed + chunk)
            _, frames = ref_main.evaluate_model(
                device="cpu",
                model=ref_model,
                decoder_model=ref_tok,
                num_embeddings=ref_tok.vq.num_embeddings,
                mask_token_index=ref_tok.vq.num_embeddings,
                batch_size=b,
                num_steps=num_frames,
                n_past=n_past,
                image_width=image_width,
                dataset=dataset,
            )
            # frames[0] is the seed frame; frames[1:] are generated
            # (B,1,H,W) each
            gen = torch.stack(frames[1:], dim=1)  # (B, T, 1, H, W)
            gen = gen.permute(0, 1, 3, 4, 2).numpy()
            _save_chunk(cpath, gen)
        clips.append(gen)
        done += b
        chunk += 1
        print(f"ref: {done}/{n_clips}", flush=True)
        if on_chunk is not None:
            on_chunk(np.concatenate(clips, axis=0))
    return np.concatenate(clips, axis=0)[:n_clips]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--clips", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--num_frames", type=int, default=8)
    p.add_argument("--iters", type=int, default=30,
                   help="unmask iterations for OUR sampler (the reference "
                   "hardcodes 30)")
    p.add_argument("--use_ema", action="store_true")
    p.add_argument("--platform", default="cpu",
                   help="platform for OUR side (reference side is torch "
                   "CPU always); cpu keeps both frameworks on one device")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument(
        "--tokenizer_extractor",
        default=os.environ.get("WMZ_TOKENIZER_EXTRACTOR", ""),
        help="tokenizer checkpoint for the second-opinion feature "
        "extractor (utils/fvd.make_tokenizer_extractor); scores every "
        "pair with BOTH extractors when set",
    )
    p.add_argument(
        "--cache_dir", default="",
        help="directory for per-chunk rollout caches (resume support); "
        "defaults to <out dir>/two_fw_cache",
    )
    p.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "artifacts", "round4", "two_framework_fvd.json",
        ),
    )
    args = p.parse_args(argv)

    import torch

    for name in ("torchvision", "torchvision.transforms", "wandb",
                 "matplotlib", "matplotlib.pyplot"):
        _stub_module(name)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from world_modelz_tpu.cli.train_vqae import load_tokenizer
    from world_modelz_tpu.cli.video_diffusion import (
        VideoDiffusionConfig,
        make_model,
    )
    from world_modelz_tpu.data import MovingMNIST
    from world_modelz_tpu.diffusion import rollout_frames
    from world_modelz_tpu.train.checkpoint import restore_checkpoint
    from world_modelz_tpu.utils import fvd as F
    from world_modelz_tpu.utils.config import config_from_dict
    from world_modelz_tpu.utils.torch_export import (
        tokenizer_state_dict_from_state,
        video_state_dict_from_params,
    )

    state, step, config = restore_checkpoint(args.checkpoint)
    cfg = config_from_dict(VideoDiffusionConfig, config)
    params = (
        state["ema"] if args.use_ema and state.get("ema")
        else state["params"]
    )
    tok, tok_state, tok_cfg = load_tokenizer(cfg.decoder_model)
    print(f"checkpoint step {step}, grid from tokenizer "
          f"ds={tok_cfg['downscale_steps']}")

    # ---- our side ------------------------------------------------------
    ds = MovingMNIST(
        seq_len=cfg.n_past + 1, image_size=cfg.image_size,
        num_digits=cfg.num_digits, digit_size=cfg.digit_size,
        deterministic=False,
    )
    cache_dir = args.cache_dir or os.path.join(
        os.path.dirname(os.path.abspath(args.out)), "two_fw_cache"
    )
    _check_cache_meta(cache_dir, {
        "checkpoint": os.path.abspath(args.checkpoint), "step": int(step),
        "clips": args.clips, "batch_size": args.batch_size,
        "num_frames": args.num_frames, "iters": args.iters,
        "use_ema": bool(args.use_ema), "seed": args.seed,
    })
    model = None
    ours = []
    done = 0
    chunk = 0
    while done < args.clips:
        b = min(args.batch_size, args.clips - done)
        cpath = _chunk_cache(cache_dir, "ours", chunk)
        clip = _load_chunk(cpath)
        if clip is None or clip.shape[0] != b:
            # per-chunk seeding keeps the stream identical whether or not
            # earlier chunks were served from the cache
            rng = np.random.default_rng(args.seed + 7 + 1000 * chunk)
            frames = jnp.asarray(ds.sample_batch(rng, b))
            bb, s, hh, ww, c = frames.shape
            tokens = tok.encode(
                tok_state, frames.reshape(bb * s, hh, ww, c)
            )
            tokens = tokens.reshape(
                bb, s, tokens.shape[1], tokens.shape[2]
            )
            if model is None:
                model = make_model(
                    cfg, (s, tokens.shape[2], tokens.shape[3]),
                    tok.num_embeddings,
                )
            gen = rollout_frames(
                jax.random.PRNGKey(args.seed + chunk),
                lambda z: model.apply({"params": params}, z),
                tokens,
                num_frames=args.num_frames,
                num_classes=tok.num_embeddings,
                mask_token=tok.num_embeddings,
                num_iterations=args.iters,
            )
            t = gen.shape[1]
            dec = tok.decode(
                tok_state, gen.reshape(bb * t, *gen.shape[2:])
            )
            clip = np.asarray(jax.device_get(dec)).reshape(
                bb, t, *dec.shape[1:]
            )
            _save_chunk(cpath, clip)
        ours.append(clip)
        done += b
        chunk += 1
        print(f"ours: {done}/{args.clips}", flush=True)
    ours = np.concatenate(ours, axis=0)[: args.clips]

    # ---- reference side: same weights, their classes + their sampler ---
    ref_main = _import_ref("vq-video-diffusion", "main")
    ref_vqae = _import_ref("minecraft", "train_vqae").VqAutoEncoder

    def to_t(sd):
        return {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}

    ref_tok = ref_vqae(
        embedding_dim=tok_cfg["embedding_dim"],
        num_embeddings=tok_cfg["num_embeddings"],
        downscale_steps=tok_cfg["downscale_steps"],
        hidden_planes=tok_cfg["hidden_planes"],
        in_channels=tok_cfg["in_channels"],
    )
    miss, unexp = ref_tok.load_state_dict(
        to_t(tokenizer_state_dict_from_state(tok_state)), strict=True
    )
    assert not miss and not unexp, (miss, unexp)
    ref_tok.eval()

    # reconstruct the denoiser at the trained shape
    grid = tok.token_grid_shape((cfg.image_size, cfg.image_size))
    ref_model = ref_main.VqVideoDiffusionModel(
        data_shape=(cfg.n_past + 1, grid[0], grid[1]),
        dim=cfg.dim, num_classes=tok.num_embeddings,
        extents=tuple(cfg.extents), depth=cfg.depth,
        dim_head=cfg.dim_head, mlp_dim=cfg.mlp_dim, heads=cfg.heads,
    )
    miss, unexp = ref_model.load_state_dict(
        to_t(video_state_dict_from_params(params)), strict=True
    )
    assert not miss and not unexp, (miss, unexp)
    ref_model.eval()

    # ---- real clips + extractors (before the slow ref loop, so every
    # ref chunk can emit a partial score) ---------------------------------
    # Real clips come from a SECOND dataset whose seq_len covers the full
    # scored window: `ds` has seq_len = n_past+1 (context length), which is
    # shorter than num_frames by default, and comparing 8-frame generated
    # clips against 6-frame real clips biased every *_vs_real row (the
    # extractors' temporal pooling is length-dependent).
    ds_real = MovingMNIST(
        seq_len=max(args.num_frames, cfg.n_past + 1),
        image_size=cfg.image_size, num_digits=cfg.num_digits,
        digit_size=cfg.digit_size, deterministic=False,
    )
    rng = np.random.default_rng(args.seed + 999)
    real_a = np.stack(
        [ds_real[int(i)] for i in rng.integers(0, len(ds_real), args.clips)]
    )[:, : args.num_frames]
    real_b = np.stack(
        [ds_real[int(i)] for i in rng.integers(0, len(ds_real), args.clips)]
    )[:, : args.num_frames]
    ours_t = ours[:, : args.num_frames]

    extractors = {"tiny": F.make_extractor("tiny")}
    if args.tokenizer_extractor:
        extractors["tokenizer"] = F.make_extractor(
            "tokenizer", weights=args.tokenizer_extractor
        )
    feats = {
        ename: {
            "real_a": ex(real_a), "real_b": ex(real_b),
            "ours": ex(ours_t),
        }
        for ename, ex in extractors.items()
    }

    def score(ref_clips, partial=False):
        ref_t = ref_clips[:, : args.num_frames]
        scores = {}
        for ename, ex in extractors.items():
            fs = dict(feats[ename])
            fs["ref"] = ex(ref_t)
            # partial scores compare equal-sized sets: subsample the
            # non-ref sides to the ref count (FVD is N-sensitive)
            n = ref_t.shape[0]
            rows = {}
            for name, (a, b) in {
                "noise_floor_real_vs_real": ("real_a", "real_b"),
                "ours_vs_real": ("ours", "real_a"),
                "ref_vs_real": ("ref", "real_a"),
                "ours_vs_ref": ("ours", "ref"),
            }.items():
                point, lo, hi = F.fvd_bootstrap(fs[a][:n], fs[b][:n])
                rows[name] = {"fvd": point, "ci95": [lo, hi]}
            scores[ename] = rows
        tiny = scores["tiny"]
        ours_fvd = tiny["ours_vs_real"]["fvd"]
        ref_fvd = tiny["ref_vs_real"]["fvd"]
        rel = abs(ours_fvd - ref_fvd) / max(ref_fvd, 1e-9)
        out = {
            "about": (
                "same trained weights sampled by BOTH frameworks (ours: "
                "diffusion.rollout_frames; reference: its own "
                "evaluate_model from vq-video-diffusion/main.py), scored "
                "by each extractor vs held-out real clips (full "
                "num_frames length) and vs each other"
            ),
            "checkpoint": args.checkpoint,
            "step": step,
            "clips": args.clips,
            "ref_clips_scored": int(ref_t.shape[0]),
            "partial": bool(partial),
            "num_frames": args.num_frames,
            "our_iters": args.iters,
            "reference_iters": 30,
            "extractors": sorted(extractors),
            "scores": scores,
            "parity": {
                "ours_vs_real_fvd": ours_fvd,
                "ref_vs_real_fvd": ref_fvd,
                "rel_diff": rel,
                "within_1pct": bool(rel <= 0.01),
                "note": (
                    "north-star criterion: the two frameworks' "
                    "FVD-vs-real agree; ours_vs_ref near the "
                    "real-vs-real noise floor corroborates "
                    "distribution-level parity (tiny extractor; see "
                    "scores.tokenizer for the second opinion)"
                ),
            },
        }
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
        tag = f"partial {ref_t.shape[0]}/{args.clips}" if partial else "final"
        print(f"[{tag}]", json.dumps(out["parity"], indent=1))
        print("->", args.out)

    # ---- reference side: their classes + their sampler ------------------
    ref_clips = reference_rollouts(
        torch=torch, ref_main=ref_main, ref_model=ref_model,
        ref_tok=ref_tok, dataset=ds, n_clips=args.clips,
        batch_size=args.batch_size, num_frames=args.num_frames,
        n_past=cfg.n_past, image_width=cfg.image_size,
        seed=args.seed + 1000, cache_dir=cache_dir,
        on_chunk=lambda c: score(c, partial=True),
    )
    print("reference rollouts:", ref_clips.shape)
    score(ref_clips, partial=False)


if __name__ == "__main__":
    main()
