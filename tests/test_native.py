"""Tests for the native (C++) host-pipeline kernels vs their numpy
fallbacks, and for pipeline determinism after the native refactor."""

import numpy as np
import pytest

from world_modelz_tpu.data import MovingMNIST, SyntheticTrajectorySource
from world_modelz_tpu.data import native


def _numpy_composite(frames, sprite, pos):
    t, h, w = frames.shape
    k = sprite.shape[0]
    for i in range(t):
        sy, sx = int(pos[i, 0]), int(pos[i, 1])
        y0, y1 = max(0, sy), min(h, sy + k)
        x0, x1 = max(0, sx), min(w, sx + k)
        if y1 <= y0 or x1 <= x0:
            continue
        frames[i, y0:y1, x0:x1] += sprite[y0 - sy : y1 - sy, x0 - sx : x1 - sx]


def test_native_lib_builds():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("no C++ toolchain available; fallbacks in use")
    assert hasattr(lib, "composite_sprite")


def test_composite_sprite_matches_numpy(rng):
    sprite = rng.uniform(0, 1, (5, 5)).astype(np.float32)
    pos = rng.integers(-3, 14, (7, 2)).astype(np.int32)  # incl. off-edge
    a = np.zeros((7, 12, 12), np.float32)
    b = np.zeros((7, 12, 12), np.float32)
    native.composite_sprite(a, sprite, pos)
    _numpy_composite(b, sprite, pos)
    np.testing.assert_allclose(a, b)


def test_clamp01(rng):
    x = rng.normal(0.5, 1.0, (4, 8, 8, 1)).astype(np.float32)
    expected = np.clip(x, 0, 1)
    native.clamp01(x)
    np.testing.assert_allclose(x, expected)


def test_render_trajectory_matches_fallback(rng, monkeypatch):
    t, s, n = 5, 16, 3
    bg = rng.uniform(0, 255, (s, 2 * s, 3)).astype(np.float32)
    shifts = rng.integers(0, s, t).astype(np.int32)
    rects = np.zeros((t, n, 6), np.float32)
    rects[..., 0] = rng.integers(0, s - 6, (t, n))
    rects[..., 1] = rng.integers(0, s - 6, (t, n))
    rects[..., 2] = rng.integers(3, 6, (t, n))
    rects[..., 3:6] = rng.uniform(80, 255, (t, n, 3))

    a = np.empty((t, s, s, 3), np.uint8)
    native.render_trajectory(a, bg, shifts, rects)

    b = np.empty((t, s, s, 3), np.uint8)
    monkeypatch.setattr(native, "get_lib", lambda: None)
    native.render_trajectory(b, bg, shifts, rects)
    np.testing.assert_array_equal(a, b)


def test_moving_mnist_native_deterministic():
    ds = MovingMNIST(seq_len=5, image_size=48, digit_size=16, num_digits=2)
    a, b = ds[11], ds[11]
    np.testing.assert_array_equal(a, b)
    assert a.max() <= 1.0 and a.max() > 0.5


def test_moving_mnist_native_vs_fallback(monkeypatch):
    ds = MovingMNIST(seq_len=4, image_size=32, digit_size=12)
    a = ds[3]
    monkeypatch.setattr(native, "get_lib", lambda: None)
    b = ds[3]
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_synthetic_source_native_vs_fallback(monkeypatch):
    src = SyntheticTrajectorySource(num_trajectories=1, traj_frames=6)
    a = np.stack(list(src.load_frames("synthetic-0000")))
    monkeypatch.setattr(native, "get_lib", lambda: None)
    b = np.stack(list(src.load_frames("synthetic-0000")))
    np.testing.assert_array_equal(a, b)
