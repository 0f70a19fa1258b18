"""Fréchet Video Distance (FVD) evaluation harness.

The reference judges rollout quality qualitatively (GIF grids,
vq-video-diffusion/results/README.md:13-24); the BASELINE north-star asks
for *FVD parity* with those published rollouts. This module supplies the
standard metric (Unterthiner et al., "Towards Accurate Generative Models of
Video", 2018): embed real and generated clips with a video feature network,
fit a Gaussian to each feature cloud, and report the Fréchet distance

    FVD = |mu_r - mu_g|^2 + tr(S_r + S_g - 2 (S_r S_g)^{1/2}).

Feature extractors are pluggable:

- ``i3d`` — the canonical Kinetics-400 InceptionV1-3D network (400-d
  logits), implemented here in flax. The environment has zero egress, so
  the pretrained weights cannot be downloaded; mount them as an ``.npz``
  whose keys are '/'-joined flax parameter paths (see
  :func:`i3d_param_paths`) and pass the path via ``weights=`` or the
  ``WMZ_I3D_WEIGHTS`` environment variable. With real weights the reported
  number is comparable to published FVD scores.
- ``tiny`` — a deterministic random-feature 3D conv net (fixed PRNG
  weights, no files needed). Random-projection features still yield a valid
  distribution distance — zero iff the feature distributions match, and
  monotone in gross distribution mismatch — so it is useful for *trend*
  tracking between checkpoints and for testing the harness, but its scale
  is not comparable to published FVD numbers.

Feature extraction runs jitted on device; the Gaussian fit and distance run
on host in float64 (one-shot D×D eval math where precision matters).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Extractor = Callable[[jnp.ndarray], jnp.ndarray]  # (B,T,H,W,C)->(B,D)


# ---------------------------------------------------------------------------
# Fréchet distance
# ---------------------------------------------------------------------------


def gaussian_stats(feats) -> Tuple[np.ndarray, np.ndarray]:
    """Mean and covariance of an (N, D) feature matrix.

    Host numpy in float64: the Gaussian fit + distance is a one-shot D×D
    eval-side computation where f64 matters (covariance eigenvalues span
    many orders of magnitude) and device jit buys nothing.
    """
    f = np.asarray(feats, dtype=np.float64)
    mu = f.mean(axis=0)
    d = f - mu
    sigma = (d.T @ d) / max(f.shape[0] - 1, 1)
    return mu, sigma


def frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Fréchet distance between two Gaussians, without scipy.

    tr((S1 S2)^{1/2}) is computed through symmetric eigendecompositions:
    with E = S1^{1/2} (by eigh), M = E S2 E is PSD and similar to S1 S2, so
    tr((S1 S2)^{1/2}) = sum(sqrt(eigvalsh(M))). Eigenvalues are clamped at
    zero to absorb round-off; ``eps`` ridges both covariances (bias
    ≤ 2·eps·D, negligible against real FVD magnitudes).
    """
    mu1 = np.asarray(mu1, dtype=np.float64)
    mu2 = np.asarray(mu2, dtype=np.float64)
    d = mu1 - mu2
    eye = np.eye(sigma1.shape[0])
    s1 = np.asarray(sigma1, dtype=np.float64) + eps * eye
    s2 = np.asarray(sigma2, dtype=np.float64) + eps * eye

    w1, v1 = np.linalg.eigh(s1)
    sqrt_s1 = (v1 * np.sqrt(np.clip(w1, 0.0, None))) @ v1.T
    m = sqrt_s1 @ s2 @ sqrt_s1
    m = (m + m.T) / 2.0
    covmean_trace = np.sum(
        np.sqrt(np.clip(np.linalg.eigvalsh(m), 0.0, None))
    )
    return float(
        d @ d + np.trace(s1) + np.trace(s2) - 2.0 * covmean_trace
    )


def fvd_from_features(real_feats, gen_feats) -> float:
    """FVD between two (N, D) feature matrices."""
    mu_r, s_r = gaussian_stats(real_feats)
    mu_g, s_g = gaussian_stats(gen_feats)
    return frechet_distance(mu_r, s_r, mu_g, s_g)


def fvd_bootstrap(
    real_feats,
    gen_feats,
    n_boot: int = 200,
    seed: int = 0,
    ci: float = 0.95,
) -> Tuple[float, float, float]:
    """FVD point estimate + bootstrap confidence interval.

    Clip-level resampling with replacement on BOTH sides; returns
    (fvd, lo, hi). FVD is a biased, high-variance estimator at small N
    (round-2 review: 16-clip FVDs were flat across checkpoints — pure
    estimator noise was indistinguishable from signal), so every reported
    number should carry its CI.

    Uses a RECENTERED percentile interval: resampling with replacement
    shrinks the effective sample and biases FVD upward by a roughly
    constant amount, so raw percentile intervals sit entirely above the
    point estimate (and the basic/reflected interval overshoots the
    correction and sits entirely below it). Instead we take the bootstrap
    distribution's spread around its own mean — which is bias-free to
    first order — and anchor it at the point estimate:
    ``point + q_{a/2..1-a/2}(samples - mean(samples))``. lo clamps at 0.
    """
    real_feats = np.asarray(real_feats)
    gen_feats = np.asarray(gen_feats)
    point = fvd_from_features(real_feats, gen_feats)
    rng = np.random.default_rng(seed)
    n_r, n_g = len(real_feats), len(gen_feats)
    samples = np.empty(n_boot)
    for i in range(n_boot):
        rs = real_feats[rng.integers(0, n_r, n_r)]
        gs = gen_feats[rng.integers(0, n_g, n_g)]
        samples[i] = fvd_from_features(rs, gs)
    alpha = (1.0 - ci) / 2.0
    d_lo, d_hi = np.quantile(samples - samples.mean(), [alpha, 1.0 - alpha])
    lo = max(0.0, point + d_lo)
    hi = max(0.0, point + d_hi)
    return float(point), float(lo), float(hi)


# ---------------------------------------------------------------------------
# Deterministic random-feature extractor (no weights required)
# ---------------------------------------------------------------------------


def _conv3d(x, w, stride):
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding="SAME",
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


@partial(jax.jit, static_argnames=("dim",))
def _tiny_forward(videos: jnp.ndarray, dim: int = 128) -> jnp.ndarray:
    """Fixed-weight 3D conv features; videos (B,T,H,W,C) in [0,1]."""
    b, t, h, w, c = videos.shape
    x = videos.astype(jnp.float32)
    if c == 1:
        x = jnp.repeat(x, 3, axis=-1)
    elif c != 3:
        x = x[..., :3]
    x = jax.image.resize(x, (b, t, 32, 32, 3), "linear")
    x = x * 2.0 - 1.0

    keys = jax.random.split(jax.random.PRNGKey(42), 4)
    chans = [(3, 32), (32, 64), (64, dim)]
    strides = [(1, 2, 2), (2, 2, 2), (2, 2, 2)]
    for k, (ci, co), s in zip(keys, chans, strides):
        wgt = jax.random.normal(k, (3, 3, 3, ci, co)) * np.sqrt(
            2.0 / (27 * ci)
        )
        x = jax.nn.relu(_conv3d(x, wgt.astype(x.dtype), s))
    mean = jnp.mean(x, axis=(1, 2, 3))
    std = jnp.std(x, axis=(1, 2, 3))
    return jnp.concatenate([mean, std], axis=-1)  # (B, 2*dim)


def tiny_video_features(videos: jnp.ndarray, dim: int = 128) -> jnp.ndarray:
    """Deterministic 256-d features from a fixed random 3D conv net."""
    return _tiny_forward(videos, dim=dim)


# ---------------------------------------------------------------------------
# I3D (InceptionV1-3D, Kinetics-400) — the canonical FVD feature network
# ---------------------------------------------------------------------------

import flax.linen as nn  # noqa: E402  (heavy import kept below the light API)


class Unit3D(nn.Module):
    """Conv3D + frozen BatchNorm + ReLU, the I3D building block."""

    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    stride: Tuple[int, int, int] = (1, 1, 1)
    use_bn: bool = True
    activation: bool = True

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            self.kernel,
            strides=self.stride,
            padding="SAME",
            use_bias=not self.use_bn,
            name="conv",
        )(x)
        if self.use_bn:
            # inference-only: stored moments, no running update
            x = nn.BatchNorm(
                use_running_average=True,
                epsilon=1e-3,
                momentum=0.99,
                name="bn",
            )(x)
        if self.activation:
            x = jax.nn.relu(x)
        return x


class InceptionBlock(nn.Module):
    """Four-branch inception mixing unit (I3D 'Mixed_*')."""

    channels: Sequence[int]  # (b0, b1a, b1b, b2a, b2b, b3)

    @nn.compact
    def __call__(self, x):
        c = self.channels
        b0 = Unit3D(c[0], name="b0")(x)
        b1 = Unit3D(c[1], name="b1a")(x)
        b1 = Unit3D(c[2], (3, 3, 3), name="b1b")(b1)
        b2 = Unit3D(c[3], name="b2a")(x)
        b2 = Unit3D(c[4], (3, 3, 3), name="b2b")(b2)
        b3 = nn.max_pool(
            x, (3, 3, 3), strides=(1, 1, 1), padding="SAME"
        )
        b3 = Unit3D(c[5], name="b3b")(b3)
        return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class I3D(nn.Module):
    """Inflated Inception-V1 video classifier (Carreira & Zisserman 2017).

    Input (B, T, H, W, 3) in [-1, 1]; output (B, num_classes) mean logits —
    the feature space used by the published FVD metric.
    """

    num_classes: int = 400

    @nn.compact
    def __call__(self, x):
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding="SAME")
        x = InceptionBlock((64, 96, 128, 16, 32, 32), name="Mixed_3b")(x)
        x = InceptionBlock((128, 128, 192, 32, 96, 64), name="Mixed_3c")(x)
        x = nn.max_pool(x, (3, 3, 3), strides=(2, 2, 2), padding="SAME")
        x = InceptionBlock((192, 96, 208, 16, 48, 64), name="Mixed_4b")(x)
        x = InceptionBlock((160, 112, 224, 24, 64, 64), name="Mixed_4c")(x)
        x = InceptionBlock((128, 128, 256, 24, 64, 64), name="Mixed_4d")(x)
        x = InceptionBlock((112, 144, 288, 32, 64, 64), name="Mixed_4e")(x)
        x = InceptionBlock((256, 160, 320, 32, 128, 128), name="Mixed_4f")(x)
        x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2), padding="SAME")
        x = InceptionBlock((256, 160, 320, 32, 128, 128), name="Mixed_5b")(x)
        x = InceptionBlock((384, 192, 384, 48, 128, 128), name="Mixed_5c")(x)
        # spatial average, keep time, then 1x1x1 logits conv and time-mean
        x = jnp.mean(x, axis=(2, 3), keepdims=True)
        x = Unit3D(
            self.num_classes,
            use_bn=False,
            activation=False,
            name="logits",
        )(x)
        return jnp.mean(x[:, :, 0, 0, :], axis=1)


def i3d_init(num_classes: int = 400):
    """(model, variables) with random weights (shape/plumbing tests)."""
    model = I3D(num_classes=num_classes)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 64, 64, 3))
    )
    return model, variables


def i3d_abstract(num_classes: int = 400):
    """(model, ShapeDtypeStruct tree) without computing an init."""
    model = I3D(num_classes=num_classes)
    variables = jax.eval_shape(
        lambda k: model.init(k, jnp.zeros((1, 16, 64, 64, 3))),
        jax.random.PRNGKey(0),
    )
    return model, variables


def i3d_param_paths(variables) -> Sequence[str]:
    """The '/'-joined tree paths an I3D weights .npz must provide."""
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    return sorted(
        "/".join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path
        )
        for path, _ in flat
    )


def load_i3d(weights_path: str):
    """Load I3D variables from an .npz keyed by flax tree paths.

    Convert the public Kinetics-400 I3D checkpoint (TF-hub or the
    torchscript variant used by StyleGAN-V) offline into this layout:
    every array stored under its '/'-joined flax path, e.g.
    ``params/Conv3d_1a_7x7/conv/kernel`` with kernel axes (T, H, W, I, O)
    and batch-norm moments under ``batch_stats/...``.
    """
    model, variables = i3d_abstract()
    with np.load(weights_path) as archive:
        expected = i3d_param_paths(variables)
        missing = [k for k in expected if k not in archive.files]
        if missing:
            raise ValueError(
                f"I3D weights file {weights_path} is missing "
                f"{len(missing)} arrays, e.g. {missing[:5]}"
            )
        flat = jax.tree_util.tree_flatten_with_path(variables)
        loaded = []
        for path, cur in flat[0]:
            key = "/".join(
                p.key if hasattr(p, "key") else str(p.idx) for p in path
            )
            arr = jnp.asarray(archive[key])
            if arr.shape != cur.shape:
                raise ValueError(
                    f"{key}: shape {arr.shape} != expected {cur.shape}"
                )
            loaded.append(arr)
    return model, jax.tree_util.tree_unflatten(flat[1], loaded)


def i3d_features(model, variables, videos: jnp.ndarray) -> jnp.ndarray:
    """I3D logits features; videos (B,T,H,W,C) in [0,1], resized to 224."""
    b, t, h, w, c = videos.shape
    x = videos.astype(jnp.float32)
    if c == 1:
        x = jnp.repeat(x, 3, axis=-1)
    if (h, w) != (224, 224):
        x = jax.image.resize(x, (b, t, 224, 224, 3), "linear")
    return model.apply(variables, x * 2.0 - 1.0)


# ---------------------------------------------------------------------------
# Harness
# ---------------------------------------------------------------------------


def make_tokenizer_extractor(checkpoint: str) -> Extractor:
    """Second-opinion video feature extractor from a TRAINED tokenizer.

    Pools the tokenizer encoder's PRE-quantization latents — a feature
    space learned on the actual data domain, architecturally and
    weight-wise independent of the deterministic random-projection
    'tiny' extractor — so FVD conclusions can be corroborated across two
    unrelated feature sets (VERDICT r3: quality evidence was
    single-extractor). Per clip: per-frame spatial mean and std of the
    (h', w', D) latents, the spatial mean of |latent_t - latent_{t-1}|
    (motion energy), and the spatial mean of the SECOND difference
    |(z_{t+1}-z_t) - (z_t-z_{t-1})| (acceleration), each averaged over
    time -> (4*D,) features. Motion energy alone was nearly invariant to
    temporal reordering (a cyclic shuffle preserves most adjacent pairs —
    round-4 discrimination test failed); real dynamics are smooth, so any
    reordering discontinuity spikes the acceleration term.
    """
    from world_modelz_tpu.cli.train_vqae import load_tokenizer

    tok, state, _ = load_tokenizer(checkpoint)

    @jax.jit
    def feats(videos: jnp.ndarray) -> jnp.ndarray:
        n, t, h, w, c = videos.shape
        z = tok.encode_continuous(
            state, videos.astype(jnp.float32).reshape(n * t, h, w, c)
        )
        z = z.reshape(n, t, *z.shape[1:])  # (N, T, h', w', D)
        mean = z.mean(axis=(2, 3))  # (N, T, D)
        std = z.std(axis=(2, 3))
        vel = z[:, 1:] - z[:, :-1]
        motion = jnp.abs(vel).mean(axis=(2, 3))
        accel = jnp.abs(vel[:, 1:] - vel[:, :-1]).mean(axis=(2, 3))
        return jnp.concatenate(
            [mean.mean(axis=1), std.mean(axis=1), motion.mean(axis=1),
             accel.mean(axis=1)],
            axis=-1,
        )

    return feats


def make_extractor(
    name: str = "tiny", weights: Optional[str] = None
) -> Extractor:
    """Build a feature extractor by name ('tiny', 'i3d', or 'tokenizer').

    'tokenizer' reads the checkpoint path from `weights` (or
    WMZ_TOKENIZER_EXTRACTOR) — see `make_tokenizer_extractor`."""
    if name == "tiny":
        return tiny_video_features
    if name == "tokenizer":
        weights = weights or os.environ.get("WMZ_TOKENIZER_EXTRACTOR", "")
        if not weights:
            raise ValueError(
                "tokenizer extractor needs a tokenizer checkpoint: pass "
                "weights= or set WMZ_TOKENIZER_EXTRACTOR"
            )
        return make_tokenizer_extractor(weights)
    if name == "i3d":
        weights = weights or os.environ.get("WMZ_I3D_WEIGHTS", "")
        if weights:
            model, variables = load_i3d(weights)
        else:
            raise ValueError(
                "i3d extractor needs pretrained weights: pass weights= or "
                "set WMZ_I3D_WEIGHTS (zero-egress: mount the converted "
                ".npz; see load_i3d docstring)"
            )
        fwd = jax.jit(lambda v: i3d_features(model, variables, v))
        return fwd
    raise ValueError(
        f"unknown extractor {name!r} (use 'tiny', 'i3d', or 'tokenizer')"
    )


def extract_features(
    extractor: Extractor, videos: np.ndarray, batch_size: int = 16
) -> np.ndarray:
    """Batched (N,T,H,W,C) -> (N,D) feature extraction (host loop)."""
    out = []
    for i in range(0, len(videos), batch_size):
        out.append(
            np.asarray(extractor(jnp.asarray(videos[i : i + batch_size])))
        )
    return np.concatenate(out, axis=0)


def fvd(
    real_videos: np.ndarray,
    gen_videos: np.ndarray,
    extractor: Optional[Extractor] = None,
    batch_size: int = 16,
) -> float:
    """FVD between two video sets (N,T,H,W,C) in [0,1]; same T required."""
    if real_videos.shape[1:] != gen_videos.shape[1:]:
        raise ValueError(
            f"clip shapes differ: real {real_videos.shape[1:]} vs "
            f"generated {gen_videos.shape[1:]}"
        )
    extractor = extractor or tiny_video_features
    real_f = extract_features(extractor, real_videos, batch_size)
    gen_f = extract_features(extractor, gen_videos, batch_size)
    return fvd_from_features(real_f, gen_f)
