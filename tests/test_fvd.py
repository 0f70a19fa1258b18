"""FVD harness tests: Fréchet math, extractors, end-to-end scoring."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from world_modelz_tpu.utils import fvd as F


def test_frechet_closed_form_identical():
    rng = np.random.default_rng(0)
    mu = rng.normal(size=6)
    a = rng.normal(size=(6, 6))
    s = a @ a.T + 0.5 * np.eye(6)
    assert abs(F.frechet_distance(mu, s, mu, s)) < 1e-8  # ridge cancels


def test_frechet_diagonal_closed_form():
    # for diagonal covariances the distance is elementwise:
    # |mu1-mu2|^2 + sum (sqrt(d1) - sqrt(d2))^2
    mu1 = np.array([0.0, 1.0, -2.0])
    mu2 = np.array([1.0, 0.0, 0.5])
    d1 = np.array([1.0, 4.0, 0.25])
    d2 = np.array([2.0, 1.0, 1.0])
    expect = np.sum((mu1 - mu2) ** 2) + np.sum(
        (np.sqrt(d1) - np.sqrt(d2)) ** 2
    )
    got = F.frechet_distance(mu1, np.diag(d1), mu2, np.diag(d2))
    assert abs(got - expect) < 1e-5


def test_frechet_symmetric_and_nonnegative():
    rng = np.random.default_rng(1)
    f1 = rng.normal(size=(128, 8))
    f2 = rng.normal(size=(128, 8)) * 1.5 + 0.3
    mu1, s1 = F.gaussian_stats(f1)
    mu2, s2 = F.gaussian_stats(f2)
    d12 = F.frechet_distance(mu1, s1, mu2, s2)
    d21 = F.frechet_distance(mu2, s2, mu1, s1)
    assert d12 > 0
    assert abs(d12 - d21) < 1e-6


def test_tiny_extractor_deterministic(rng):
    vids = rng.uniform(size=(6, 4, 32, 32, 1)).astype(np.float32)
    f1 = F.tiny_video_features(jnp.asarray(vids))
    f2 = F.tiny_video_features(jnp.asarray(vids))
    assert f1.shape == (6, 256)
    assert jnp.allclose(f1, f2)
    # channel handling: 3-channel input works too
    f3 = F.tiny_video_features(jnp.asarray(np.repeat(vids, 3, axis=-1)))
    assert f3.shape == (6, 256)


def test_fvd_discriminates(rng):
    real = rng.uniform(size=(24, 4, 32, 32, 1)).astype(np.float32)
    same = real.copy()
    noisy = np.clip(
        real + 0.5 * rng.normal(size=real.shape), 0, 1
    ).astype(np.float32)
    d_same = F.fvd(real, same, batch_size=8)
    d_noisy = F.fvd(real, noisy, batch_size=8)
    assert abs(d_same) < 1e-3
    assert d_noisy > 100 * max(abs(d_same), 1e-6)


def test_fvd_shape_mismatch_rejected(rng):
    a = rng.uniform(size=(4, 4, 32, 32, 1)).astype(np.float32)
    b = rng.uniform(size=(4, 5, 32, 32, 1)).astype(np.float32)
    with pytest.raises(ValueError, match="clip shapes differ"):
        F.fvd(a, b)


def test_make_extractor_names():
    assert F.make_extractor("tiny") is F.tiny_video_features
    with pytest.raises(ValueError, match="unknown extractor"):
        F.make_extractor("vgg")
    with pytest.raises(ValueError, match="weights"):
        F.make_extractor("i3d")  # no weights mounted


def test_i3d_loader_rejects_incomplete(tmp_path):
    # an npz missing keys must fail with a clear message
    p = tmp_path / "bad.npz"
    np.savez(p, **{"params/Conv3d_1a_7x7/conv/kernel": np.zeros((7, 7, 7, 3, 64))})
    with pytest.raises(ValueError, match="missing"):
        F.load_i3d(str(p))


@pytest.mark.slow
def test_i3d_random_weights_forward():
    model, variables = F.i3d_init()
    paths = F.i3d_param_paths(variables)
    assert "params/Conv3d_1a_7x7/conv/kernel" in paths
    assert "params/logits/conv/kernel" in paths
    assert any(p.startswith("batch_stats/") for p in paths)
    vids = jnp.asarray(
        np.random.default_rng(0)
        .uniform(size=(2, 8, 32, 32, 1))
        .astype(np.float32)
    )
    out = F.i3d_features(model, variables, vids)
    assert out.shape == (2, 400)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.slow
def test_i3d_loader_roundtrip(tmp_path):
    # save random-init variables under the documented key scheme, reload,
    # verify identical outputs — proves the npz contract end to end
    model, variables = F.i3d_init()
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    arrays = {
        "/".join(
            p.key if hasattr(p, "key") else str(p.idx) for p in path
        ): np.asarray(x)
        for path, x in flat
    }
    p = tmp_path / "i3d.npz"
    np.savez(p, **arrays)
    model2, loaded = F.load_i3d(str(p))
    vids = jnp.asarray(
        np.random.default_rng(1)
        .uniform(size=(1, 8, 32, 32, 3))
        .astype(np.float32)
    )
    a = F.i3d_features(model, variables, vids)
    b = F.i3d_features(model2, loaded, vids)
    assert np.allclose(np.asarray(a), np.asarray(b))


def test_fvd_bootstrap_ci_sane():
    """CI contains the point estimate (recentered percentile interval), a clear
    distribution shift is detected with a CI excluding the noise floor's,
    and results are deterministic in the seed."""
    from world_modelz_tpu.utils.fvd import fvd_bootstrap

    rng = np.random.default_rng(0)
    a = rng.normal(size=(48, 16))
    b = rng.normal(size=(48, 16))          # same distribution
    c = rng.normal(size=(48, 16)) + 2.0    # shifted

    f_ab, lo_ab, hi_ab = fvd_bootstrap(a, b, n_boot=60, seed=1)
    assert lo_ab <= f_ab <= hi_ab
    assert lo_ab >= 0.0

    f_ac, lo_ac, hi_ac = fvd_bootstrap(a, c, n_boot=60, seed=1)
    assert lo_ac <= f_ac <= hi_ac
    assert lo_ac > hi_ab  # the shift is resolvable above the floor

    again = fvd_bootstrap(a, c, n_boot=60, seed=1)
    assert again == (f_ac, lo_ac, hi_ac)


def test_fvd_calibration_tool_end_to_end(tmp_path):
    """Drive benchmarks/fvd_calibration.py at tiny n: curves are produced
    for every corruption, strengths are monotone non-decreasing for
    dropout at the extremes, and the JSON artifact is written."""
    import importlib.util

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "fvd_calibration",
        os.path.join(root, "benchmarks", "fvd_calibration.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = str(tmp_path / "cal.json")
    rep = mod.run(
        clips=10, frames=4, image_size=32, extractors=("tiny",),
        n_boot=25, seed=0, out=out, strengths=(0.25, 1.0),
    )
    assert os.path.exists(out)
    curves = rep["curves"]["tiny"]
    assert set(curves) == {"blur", "dropout", "shuffle"}
    drop = curves["dropout"]
    assert drop[-1]["fvd"] > drop[0]["fvd"]
    assert drop[-1]["fvd"] > rep["noise_floor"]["tiny"]["fvd"]


def test_tokenizer_extractor_discriminates(tmp_path):
    """The learned second-opinion extractor (utils/fvd.
    make_tokenizer_extractor — pooled pre-VQ encoder latents + motion
    energy) separates real clips from corrupted ones above its own
    real-vs-real noise floor, like the tiny extractor it corroborates."""
    import numpy as np

    from world_modelz_tpu.cli.train_vqae import TrainVqaeConfig, train
    from world_modelz_tpu.data import MovingMNIST
    from world_modelz_tpu.utils import fvd as F

    out = str(tmp_path / "tok")
    _state, info = train(TrainVqaeConfig(
        batch_size=8, image_size=32, max_steps=12, downscale_steps=2,
        embedding_dim=8, hidden_planes=16, num_embeddings=32,
        dataset="moving_mnist", in_channels=1,
        checkpoint_interval=12, vq_reuse_interval=6, log_interval=6,
        output_dir=out, name="t",
    ))
    ex = F.make_extractor("tokenizer", weights=info["checkpoint"])

    # longer clips + more of them: at seq_len 4 / N=16 the FVD estimator
    # noise dwarfs any temporal signal (round-4 flake); and the corruption
    # must be a true derangement — the previous cyclic roll preserves all
    # but one adjacent pair, which motion/acceleration features correctly
    # see as nearly-real dynamics.
    T, N = 8, 32
    ds = MovingMNIST(seq_len=T, image_size=32, digit_size=12,
                     deterministic=False)
    rng = np.random.default_rng(0)
    real = ds.sample_batch(rng, N)
    held = ds.sample_batch(rng, N)
    # temporal shuffle destroys dynamics but keeps per-frame appearance —
    # what the motion/acceleration terms catch (per-clip permutation with
    # every adjacent pair >= 2 frames apart)
    perm = np.concatenate([np.arange(0, T, 2), np.arange(1, T, 2)])
    shuf = np.stack([c[np.roll(perm, i % T)] for i, c in enumerate(held)])
    # appearance corruption: heavy pixel dropout
    drop = held * (rng.random(held.shape) > 0.5)

    rf = F.extract_features(ex, real, 8)
    assert rf.shape == (N, 4 * 8)
    floor, _, floor_hi = F.fvd_bootstrap(
        rf, F.extract_features(ex, held, 8), n_boot=40
    )
    shuffled, shuf_lo, _ = F.fvd_bootstrap(
        rf, F.extract_features(ex, shuf, 8), n_boot=40
    )
    dropped, drop_lo, _ = F.fvd_bootstrap(
        rf, F.extract_features(ex, drop, 8), n_boot=40
    )
    # temporal dynamics register with statistical margin, not just a
    # point-vs-point coin flip
    assert shuffled > floor_hi, (shuffled, floor, floor_hi)
    assert drop_lo > floor_hi  # appearance break resolvable above floor
