"""Tests for the host-side data pipelines."""

import numpy as np
import pytest

from world_modelz_tpu.data import (
    BufferedTrajectorySampler,
    MovingMNIST,
    PrefetchIterator,
    SyntheticTrajectorySource,
)
from world_modelz_tpu.data.images import FileListImageDataset, load_file_list


def test_moving_mnist_shapes_and_range():
    ds = MovingMNIST(seq_len=6, image_size=64, digit_size=24, num_digits=2)
    clip = ds[0]
    assert clip.shape == (6, 64, 64, 1)
    assert clip.dtype == np.float32
    assert clip.min() >= 0.0 and clip.max() <= 1.0
    assert clip.max() > 0.5  # digits actually rendered


def test_moving_mnist_deterministic_per_index():
    ds = MovingMNIST(seq_len=4, image_size=32, digit_size=12)
    np.testing.assert_array_equal(ds[7], ds[7])
    assert not np.array_equal(ds[7], ds[8])


def test_moving_mnist_motion():
    ds = MovingMNIST(seq_len=8, image_size=64, digit_size=24)
    clip = ds[3]
    # frames differ over time (digits move)
    diffs = [np.abs(clip[t + 1] - clip[t]).sum() for t in range(7)]
    assert all(d > 0 for d in diffs)


def test_moving_mnist_batch():
    ds = MovingMNIST(seq_len=3, image_size=32, digit_size=12)
    batch = ds.sample_batch(np.random.default_rng(0), 4)
    assert batch.shape == (4, 3, 32, 32, 1)


def test_synthetic_source_deterministic():
    src = SyntheticTrajectorySource(num_trajectories=2, traj_frames=10)
    f1 = list(src.load_frames("synthetic-0001"))
    f2 = list(src.load_frames("synthetic-0001"))
    assert len(f1) == 10
    assert f1[0].shape == (64, 64, 3) and f1[0].dtype == np.uint8
    np.testing.assert_array_equal(f1[5], f2[5])


def test_buffered_sampler_batches():
    src = SyntheticTrajectorySource(num_trajectories=3, traj_frames=120)
    sampler = BufferedTrajectorySampler(
        src, buffer_size=150, max_segment_length=60, traj_len=8, skip_frames=1
    )
    try:
        batch = sampler.sample_batch(4)
        assert batch.shape == (4, 8, 64, 64, 3)
        assert batch.dtype == np.uint8
        # consecutive frames within a clip differ (video, not stills)
        assert np.abs(
            batch[0, 1].astype(int) - batch[0, 0].astype(int)
        ).sum() > 0
        # buffer turnover: draw enough batches to cross a refill
        for _ in range(10):
            b = sampler.sample_batch(4)
            assert b.shape == (4, 8, 64, 64, 3)
    finally:
        sampler.close()


def test_prefetch_iterator_orders_and_propagates_errors():
    counter = {"n": 0}

    def make_batch():
        counter["n"] += 1
        if counter["n"] > 5:
            raise RuntimeError("source exhausted")
        return np.full((2, 2), counter["n"])

    it = PrefetchIterator(make_batch, depth=2, device_put=False)
    got = [int(next(it)[0, 0]) for _ in range(5)]
    assert got == [1, 2, 3, 4, 5]
    with pytest.raises(RuntimeError, match="source exhausted"):
        next(it)
    it.close()


def test_prefetch_device_put():
    import jax

    it = PrefetchIterator(lambda: np.ones((4, 4), np.float32), depth=1)
    batch = next(it)
    assert isinstance(batch, jax.Array)
    it.close()


def test_file_list_dataset(tmp_path):
    from PIL import Image

    d = tmp_path / "frames"
    d.mkdir()
    for i in range(5):
        Image.fromarray(
            (np.random.default_rng(i).uniform(0, 255, (16, 16, 3))).astype(
                np.uint8
            )
        ).save(d / f"f{i}.png")
    # one corrupt file that must be skipped
    (d / "bad.png").write_bytes(b"not a png")

    files = load_file_list(
        str(tmp_path / "manifest.json"), str(d / "**" / "*"), r".*\.png$"
    )
    assert len(files) == 6

    ds = FileListImageDataset(files, batch_size=4, seed=0)
    batch = ds.next_batch()
    assert batch.shape == (4, 16, 16, 3)
    assert batch.dtype == np.float32

    # manifest cache hit
    files2 = load_file_list(
        str(tmp_path / "manifest.json"), "unused", r".*\.png$"
    )
    assert files2 == files


def test_video_file_trajectory_source(tmp_path):
    """Write small mp4s with OpenCV, read them back through the source and
    the buffered sampler — the production video-corpus data path."""
    cv2 = pytest.importorskip("cv2")

    from world_modelz_tpu.data.trajectory import (
        BufferedTrajectorySampler,
        VideoFileTrajectorySource,
    )

    rng = np.random.default_rng(0)
    for name in ("a.mp4", "sub/b.mp4"):
        path = tmp_path / name
        path.parent.mkdir(parents=True, exist_ok=True)
        w = cv2.VideoWriter(
            str(path), cv2.VideoWriter_fourcc(*"mp4v"), 10, (48, 32)
        )
        assert w.isOpened()
        for t in range(40):
            frame = np.full((32, 48, 3), t * 5 % 255, np.uint8)
            frame[:, :8] = rng.integers(0, 255, (32, 8, 3), dtype=np.uint8)
            w.write(frame)
        w.release()

    src = VideoFileTrajectorySource(str(tmp_path), frame_size=16)
    names = src.trajectory_names()
    assert sorted(names) == ["a.mp4", "sub/b.mp4"]
    frames = list(src.load_frames("a.mp4"))
    assert len(frames) == 40
    assert frames[0].shape == (16, 16, 3) and frames[0].dtype == np.uint8

    sampler = BufferedTrajectorySampler(
        src, buffer_size=60, traj_len=4, skip_frames=0, seed=0,
        max_segment_length=30,
    )
    try:
        batch = sampler.sample_batch(3)
        assert batch.shape == (3, 4, 16, 16, 3)
        assert batch.dtype == np.uint8
    finally:
        sampler.close()


def test_grain_pipeline_determinism_and_state():
    """GrainClipPipeline: same seed -> identical stream; iterator state
    round-trips so the input pipeline resumes exactly (the capability the
    reference's torch DataLoader lacks across restarts)."""
    from world_modelz_tpu.data.grain_pipeline import GrainClipPipeline
    from world_modelz_tpu.data.moving_mnist import MovingMNIST

    ds = MovingMNIST(seq_len=3, image_size=32, num_digits=1, length=64)
    a = GrainClipPipeline(ds, 4, seed=7)
    b = GrainClipPipeline(ds, 4, seed=7)
    for _ in range(3):
        np.testing.assert_array_equal(a.sample_batch(), b.sample_batch())

    # mixed batch sizes (train batch + eval batch) stay in one stream
    eval_batch = a.sample_batch(2)
    assert eval_batch.shape == (2, 3, 32, 32, 1)

    # checkpoint the iterator position mid-stream and replay
    state = a.get_state()
    first = a.sample_batch()
    a.set_state(state)
    np.testing.assert_array_equal(a.sample_batch(), first)

    # different seed -> different record order
    c = GrainClipPipeline(ds, 4, seed=8)
    assert not np.array_equal(c.sample_batch(), b.sample_batch())
    a.close()


def test_grain_pipeline_sharding_disjoint():
    """shard_index/shard_count give DCN hosts disjoint record slices."""
    from world_modelz_tpu.data.grain_pipeline import GrainClipPipeline

    class Ints:
        def __len__(self):
            return 32

        def __getitem__(self, i):
            return np.asarray([i], np.int64)

    s0 = GrainClipPipeline(
        Ints(), 8, seed=3, shuffle=False, shard_index=0, shard_count=2,
        num_epochs=1,
    )
    s1 = GrainClipPipeline(
        Ints(), 8, seed=3, shuffle=False, shard_index=1, shard_count=2,
        num_epochs=1,
    )
    seen0 = set(s0.sample_batch(16)[:, 0].tolist())
    seen1 = set(s1.sample_batch(16)[:, 0].tolist())
    assert seen0.isdisjoint(seen1)
    assert len(seen0 | seen1) == 32


def test_device_composite_matches_host_compositor():
    """composite_clips(traj) reproduces the host pixel path clip-for-clip
    (same per-index RNG stream) within sprite quantization (sprites cross
    the wire as uint8; frames additionally saturate at 1)."""
    import jax.numpy as jnp

    from world_modelz_tpu.data import composite_clips

    ds = MovingMNIST(
        seq_len=6, image_size=64, digit_size=24, num_digits=2,
        deterministic=False,
    )
    traj = ds.sample_batch_traj(np.random.default_rng(5), 3)
    pix = ds.sample_batch(np.random.default_rng(5), 3)
    assert traj["sprites"].shape == (3, 2, 24, 24)
    assert traj["pos"].shape == (3, 2, 6, 2)
    out = np.asarray(
        composite_clips(
            jnp.asarray(traj["sprites"]), jnp.asarray(traj["pos"]), 64
        )
    )
    assert out.shape == pix.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    # bound: two sprites, each quantized to 1/255 with <=0.5 rounding
    assert float(np.abs(out - pix).max()) <= 2.0 / 255.0


def test_device_composite_clips_offcanvas():
    """Sprite regions outside the canvas are masked, matching the host
    compositor's clipping (compositor.cpp composite_sprite)."""
    import jax.numpy as jnp

    from world_modelz_tpu.data import composite_clips

    k, h = 4, 8
    sprite = np.full((1, 1, k, k), 255, np.uint8)
    # frame 0: hangs off top-left; frame 1: hangs off bottom-right
    pos = np.asarray([[[[-2, -2], [6, 6]]]], np.int32)  # (1, 1, 2, 2)
    out = np.asarray(
        composite_clips(jnp.asarray(sprite), jnp.asarray(pos), h)
    )[0, :, :, :, 0]
    ref = np.zeros((2, h, h), np.float32)
    ref[0, :2, :2] = 1.0
    ref[1, 6:, 6:] = 1.0
    np.testing.assert_allclose(out, ref)


def test_as_frames_formats():
    """as_frames: uint8 normalized, float passed through, dict composited."""
    import jax.numpy as jnp

    from world_modelz_tpu.data import as_frames

    u8 = np.full((1, 2, 8, 8, 1), 128, np.uint8)
    f = np.asarray(as_frames(u8, 8))
    np.testing.assert_allclose(f, 128.0 / 255.0)
    f32 = np.random.default_rng(0).random((1, 2, 8, 8, 1), np.float32)
    np.testing.assert_allclose(np.asarray(as_frames(f32, 8)), f32)
    traj = {
        "sprites": jnp.full((1, 1, 2, 2), 255, jnp.uint8),
        "pos": jnp.zeros((1, 1, 2, 2), jnp.int32),
    }
    out = np.asarray(as_frames(traj, 8))
    assert out.shape == (1, 2, 8, 8, 1)
    assert out[0, 0, 0, 0, 0] == 1.0 and out[0, 0, 4, 4, 0] == 0.0


def test_trajectory_clip_dataset_random_access():
    """TrajectoryClipDataset: record i is a pure function of (seed, i)
    (Grain's random-access contract), clips match the sampler format, and
    the Grain wrapper's iterator state resumes mid-stream exactly."""
    from world_modelz_tpu.data.grain_pipeline import GrainClipPipeline
    from world_modelz_tpu.data.trajectory import (
        SyntheticTrajectorySource,
        TrajectoryClipDataset,
    )

    src = SyntheticTrajectorySource(
        num_trajectories=3, traj_frames=60, frame_size=32, seed=1
    )
    ds = TrajectoryClipDataset(
        src, traj_len=5, skip_frames=1, examples_per_epoch=50, seed=9
    )
    a, b = ds[11], ds[11]
    assert a.shape == (5, 32, 32, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, ds[12])

    pipe = GrainClipPipeline(ds, 4, seed=3)
    pipe.sample_batch()
    state = pipe.get_state()
    nxt = pipe.sample_batch()
    pipe2 = GrainClipPipeline(ds, 4, seed=3)
    pipe2.set_state(state)
    np.testing.assert_array_equal(nxt, pipe2.sample_batch())
