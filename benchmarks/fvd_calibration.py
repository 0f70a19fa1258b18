"""FVD sensitivity calibration: what Δ-FVD does a visible corruption cost?

Round-2 review (VERDICT Missing #2): the deployed FVD numbers were flat
across 20k/50k/75k checkpoints at 16 clips — the metric as used could not
distinguish a half-trained model from the final one, and no one knew
whether that was the model converging or pure estimator noise. This tool
answers the prerequisite question: for each feature extractor, how does
FVD (with bootstrap CIs, n>=64 clips) respond to *known* corruption
strengths of the real data distribution?

Corruptions (all applied to MovingMNIST clips):
  blur      — per-frame box blur, kernel size grows with strength
  dropout   — random pixel-block dropout (gray fill), fraction = strength
  shuffle   — per-clip temporal shuffle applied to a `strength` fraction
              of clips
  tokennoise— encode->randomly resample a `strength` fraction of tokens->
              decode through a tokenizer checkpoint (--tokenizer); the
              corruption class closest to what a bad diffusion model emits

Output: artifacts/fvd_calibration.json —
  {extractor: {corruption: [{strength, fvd, ci95: [lo, hi]}, ...]},
   noise_floor: {extractor: {fvd, ci95}}}   (real vs held-out real)

A calibrated metric must (a) have a noise floor whose CI excludes the
moderate-corruption FVDs, and (b) be monotone in strength. The companion
test drives this tool end-to-end at small n; the artifact run uses
n=64-128.

Run: python benchmarks/fvd_calibration.py --clips 64 \
         [--tokenizer outputs/r2_tok/step_0001200] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

OUT_DEFAULT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "artifacts",
    "fvd_calibration.json",
)

STRENGTHS = (0.1, 0.25, 0.5, 1.0)


def corrupt_blur(clips: np.ndarray, strength: float, rng) -> np.ndarray:
    """Box blur; kernel radius 1 at 0.25, up to 4 at 1.0."""
    r = max(1, int(round(4 * strength)))
    k = 2 * r + 1
    # separable box filter via cumulative sums (pure numpy, fast enough)
    def box1d(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (r, r)
        xp = np.pad(x, pad, mode="edge")
        c = np.cumsum(xp, axis=axis, dtype=np.float64)
        lead = [slice(None)] * x.ndim
        lag = [slice(None)] * x.ndim
        lead[axis] = slice(k, None)
        lag[axis] = slice(None, -k)
        first = [slice(None)] * x.ndim
        first[axis] = slice(k - 1, k)
        head = c[tuple(first)]
        body = c[tuple(lead)] - c[tuple(lag)]
        return np.concatenate([head, body], axis=axis) / k

    out = box1d(box1d(clips.astype(np.float64), 2), 3)
    return out.astype(np.float32)


def corrupt_dropout(clips: np.ndarray, strength: float, rng) -> np.ndarray:
    """Zero out `strength` of 8x8 pixel blocks (gray 0.5 fill)."""
    n, t, h, w, c = clips.shape
    bh, bw = max(1, h // 8), max(1, w // 8)
    mask = rng.uniform(size=(n, t, 8, 8, 1)) < strength
    mask = np.kron(mask, np.ones((1, 1, bh, bw, 1), bool))[:, :, :h, :w]
    out = clips.copy()
    out[np.broadcast_to(mask, out.shape)] = 0.5
    return out


def corrupt_shuffle(clips: np.ndarray, strength: float, rng) -> np.ndarray:
    """Temporally shuffle a `strength` fraction of the clips."""
    out = clips.copy()
    n, t = clips.shape[:2]
    hit = rng.uniform(size=n) < strength
    for i in np.where(hit)[0]:
        out[i] = out[i, rng.permutation(t)]
    return out


def make_token_corruptor(tokenizer_ckpt: str):
    """encode -> resample a fraction of tokens uniformly -> decode."""
    import jax
    import jax.numpy as jnp

    from world_modelz_tpu.cli.train_vqae import load_tokenizer

    tok, state, _ = load_tokenizer(tokenizer_ckpt)
    k = tok.num_embeddings

    @jax.jit
    def roundtrip(frames, noise_tokens, keep):
        z = tok.encode(state, frames)
        z = jnp.where(keep, z, noise_tokens)
        return tok.decode(state, z)

    def corrupt(clips: np.ndarray, strength: float, rng) -> np.ndarray:
        n, t, h, w, c = clips.shape
        flat = clips.reshape(n * t, h, w, c)
        out = []
        for i in range(0, len(flat), 64):
            x = jnp.asarray(flat[i : i + 64])
            import jax.numpy as jnp2

            zshape = tok.token_grid_shape((h, w))
            m = x.shape[0]
            noise = jnp2.asarray(
                rng.integers(0, k, size=(m, *zshape)), jnp2.int32
            )
            keep = jnp2.asarray(
                rng.uniform(size=(m, *zshape)) >= strength
            )
            out.append(np.asarray(roundtrip(x, noise, keep)))
        dec = np.concatenate(out)[: n * t]
        return np.clip(dec.reshape(n, t, *dec.shape[1:]), 0.0, 1.0).astype(
            np.float32
        )

    return corrupt


CORRUPTIONS = {
    "blur": corrupt_blur,
    "dropout": corrupt_dropout,
    "shuffle": corrupt_shuffle,
}


def run(
    clips: int = 64,
    frames: int = 8,
    image_size: int = 64,
    extractors=("tiny", "i3d-random"),
    tokenizer: str = "",
    n_boot: int = 200,
    seed: int = 0,
    out: str = OUT_DEFAULT,
    strengths=STRENGTHS,
) -> dict:
    from world_modelz_tpu.data import MovingMNIST
    from world_modelz_tpu.utils import fvd as F

    rng = np.random.default_rng(seed)
    ds = MovingMNIST(
        seq_len=frames, image_size=image_size, deterministic=False
    )
    real = ds.sample_batch(rng, clips)
    held = ds.sample_batch(rng, clips)

    corruptions = dict(CORRUPTIONS)
    if tokenizer:
        corruptions["tokennoise"] = make_token_corruptor(tokenizer)

    def get_extractor(name):
        if name == "tiny":
            return F.make_extractor("tiny")
        if name == "i3d-random":
            # randomly initialized I3D: untrained features, fixed seed —
            # calibrates the architecture-matched extractor without weights
            model, variables = F.i3d_init()
            return lambda v: F.i3d_features(model, variables, v)
        if name == "tokenizer":
            # learned second-opinion features (needs --tokenizer)
            if not tokenizer:
                raise ValueError(
                    "extractor 'tokenizer' needs --tokenizer <checkpoint>"
                )
            return F.make_tokenizer_extractor(tokenizer)
        return F.make_extractor(name)

    report = {"clips": clips, "frames": frames, "noise_floor": {}, "curves": {}}
    for ename in extractors:
        ex = get_extractor(ename)
        real_f = F.extract_features(ex, real, 8)
        held_f = F.extract_features(ex, held, 8)
        flo = F.fvd_bootstrap(real_f, held_f, n_boot=n_boot, seed=seed)
        report["noise_floor"][ename] = {
            "fvd": flo[0], "ci95": [flo[1], flo[2]]
        }
        print(f"[{ename}] noise floor: {flo[0]:.4g} [{flo[1]:.4g}, {flo[2]:.4g}]")
        report["curves"][ename] = {}
        for cname, cfn in corruptions.items():
            rows = []
            for s in strengths:
                crng = np.random.default_rng(seed + int(1000 * s))
                corr = cfn(held, s, crng)
                corr_f = F.extract_features(ex, corr, 8)
                v, lo, hi = F.fvd_bootstrap(
                    real_f, corr_f, n_boot=n_boot, seed=seed
                )
                rows.append(
                    {"strength": s, "fvd": v, "ci95": [lo, hi]}
                )
                print(
                    f"[{ename}] {cname} s={s}: {v:.4g} [{lo:.4g}, {hi:.4g}]"
                )
            report["curves"][ename][cname] = rows

    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print("->", out)
    return report


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--clips", type=int, default=64)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--image_size", type=int, default=64)
    p.add_argument("--tokenizer", default="")
    p.add_argument("--n_boot", type=int, default=200)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=OUT_DEFAULT)
    p.add_argument("--platform", default="")
    p.add_argument(
        "--extractors", default="tiny,i3d-random",
        help="comma list: tiny, i3d-random, i3d",
    )
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    run(
        clips=args.clips,
        frames=args.frames,
        image_size=args.image_size,
        extractors=tuple(args.extractors.split(",")),
        tokenizer=args.tokenizer,
        n_boot=args.n_boot,
        seed=args.seed,
        out=args.out,
    )


if __name__ == "__main__":
    main()
