"""Trajectory-video sampling with a prefetching double buffer.

Capability parity with `BufferedTrajSampler`
(minecraft/buffered_traj_sampler.py:9-118): stream long gameplay
trajectories, frame-skip them, keep a random bounded segment, derive random
example offsets (one per 8 frames), and serve (B, traj_len, H, W, 3) uint8
batches while a background worker prepares the next buffer.

Re-designs (SURVEY.md §5 'race detection'):
- Trajectory decoding is behind a `TrajectorySource` interface so the
  heavyweight `minerl` dependency is optional; a procedural
  `SyntheticTrajectorySource` keeps tests and offline runs working.
- The reference's fill thread hands data over via bare attribute writes
  synchronized only by Thread.join (buffered_traj_sampler.py:86-102, and
  sampling before the first swap faults). Here completed buffers pass
  through a bounded `queue.Queue` — no shared mutable state, safe from the
  first call.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, List, Protocol, Sequence, Tuple

import numpy as np


class TrajectorySource(Protocol):
    """A named collection of frame sequences."""

    def trajectory_names(self) -> Sequence[str]:
        ...

    def load_frames(self, name: str) -> Iterable[np.ndarray]:
        """Yield (H, W, 3) uint8 frames of one trajectory."""
        ...


class SyntheticTrajectorySource:
    """Deterministic procedural gameplay-like clips (offline stand-in for
    MineRL): a scrolling textured background with moving colored blocks."""

    def __init__(
        self,
        num_trajectories: int = 8,
        traj_frames: int = 400,
        frame_size: int = 64,
        seed: int = 0,
    ):
        self.num_trajectories = num_trajectories
        self.traj_frames = traj_frames
        self.frame_size = frame_size
        self.seed = seed

    def trajectory_names(self) -> Sequence[str]:
        return [f"synthetic-{i:04d}" for i in range(self.num_trajectories)]

    def load_frames(self, name: str) -> Iterator[np.ndarray]:
        from world_modelz_tpu.data import native

        idx = int(name.rsplit("-", 1)[1])
        rng = np.random.default_rng(self.seed * 10007 + idx)
        s = self.frame_size
        # textured background, twice as wide for scrolling
        bg = (rng.uniform(40, 160, (s, 2 * s, 3))).astype(np.float32)
        bg += rng.uniform(-20, 20, (s, 2 * s, 1))
        n_obj = int(rng.integers(2, 5))
        pos = rng.uniform(0, s - 12, (n_obj, 2))
        vel = rng.uniform(-2.5, 2.5, (n_obj, 2))
        colors = rng.uniform(80, 255, (n_obj, 3))
        sizes = rng.integers(6, 14, n_obj)

        # integrate object motion in Python (cheap scalar work); the
        # per-pixel rendering runs in the native kernel
        shifts = np.empty((self.traj_frames,), np.int32)
        rects = np.empty((self.traj_frames, n_obj, 6), np.float32)
        for t in range(self.traj_frames):
            shifts[t] = int(t * 1.5) % s
            for i in range(n_obj):
                y, x = pos[i]
                k = int(sizes[i])
                y0 = int(np.clip(y, 0, s - k))
                x0 = int(np.clip(x, 0, s - k))
                rects[t, i] = (y0, x0, k, *colors[i])
                pos[i] += vel[i]
                for d in range(2):
                    if pos[i, d] < 0 or pos[i, d] > s - k:
                        vel[i, d] = -vel[i, d]
                        pos[i, d] = np.clip(pos[i, d], 0, s - k)

        out = np.empty((self.traj_frames, s, s, 3), np.uint8)
        native.render_trajectory(out, np.clip(bg, 0, 255), shifts, rects)
        yield from out


class MineRLTrajectorySource:
    """MineRL-backed source (requires the optional `minerl` package);
    mirrors the reference's enumeration + POV extraction
    (buffered_traj_sampler.py:16-20, 54-61)."""

    def __init__(self, environment_names: Sequence[str], data_dir: str):
        import minerl  # deferred heavyweight import

        self._minerl = minerl
        self.data_dir = data_dir
        names = []
        self._env_of = {}
        for env in environment_names:
            data = minerl.data.make(env, data_dir=data_dir)
            for t in data.get_trajectory_names():
                key = f"{env}/{t}"
                names.append(key)
                self._env_of[key] = (env, t)
        self._names = names

    def trajectory_names(self) -> Sequence[str]:
        return self._names

    def load_frames(self, name: str) -> Iterator[np.ndarray]:
        env, traj = self._env_of[name]
        data = self._minerl.data.make(env, data_dir=self.data_dir)
        for data_tuple in data.load_data(traj):
            yield data_tuple[0]["pov"]


class VideoFileTrajectorySource:
    """Trajectories from video files on disk (mp4/avi/mkv/webm via OpenCV).

    Each file under `root` is one trajectory; frames are decoded as RGB
    uint8 and center-crop-resized to `frame_size`. This is the production
    data path for real gameplay recordings — the reference only ever read
    MineRL's packaged format (buffered_traj_sampler.py:6); any video corpus
    works here through the same :class:`TrajectorySource` protocol, so both
    samplers and every trainer accept it unchanged.
    """

    EXTENSIONS = (".mp4", ".avi", ".mkv", ".webm", ".mov")

    def __init__(self, root: str, frame_size: int = 64, recursive: bool = True):
        import os

        self.root = root
        self.frame_size = frame_size
        names = []
        if recursive:
            for dirpath, _dirs, files in sorted(os.walk(root)):
                for f in sorted(files):
                    if f.lower().endswith(self.EXTENSIONS):
                        names.append(
                            os.path.relpath(os.path.join(dirpath, f), root)
                        )
        else:
            names = sorted(
                f
                for f in os.listdir(root)
                if f.lower().endswith(self.EXTENSIONS)
            )
        if not names:
            raise FileNotFoundError(f"no video files under {root!r}")
        self._names = names

    def trajectory_names(self) -> Sequence[str]:
        return self._names

    def load_frames(self, name: str) -> Iterator[np.ndarray]:
        import os

        import cv2  # bundled with opencv-python; ships its own ffmpeg

        cap = cv2.VideoCapture(os.path.join(self.root, name))
        if not cap.isOpened():
            raise IOError(f"cannot open video {name!r}")
        s = self.frame_size
        try:
            while True:
                ok, frame = cap.read()
                if not ok:
                    return
                h, w = frame.shape[:2]
                side = min(h, w)  # center square crop, then resize
                y0, x0 = (h - side) // 2, (w - side) // 2
                frame = frame[y0 : y0 + side, x0 : x0 + side]
                if side != s:
                    frame = cv2.resize(
                        frame, (s, s), interpolation=cv2.INTER_AREA
                    )
                yield frame[:, :, ::-1].copy()  # BGR -> RGB
        finally:
            cap.release()


class _Buffer:
    __slots__ = ("segments", "example_offsets")

    def __init__(
        self,
        segments: List[np.ndarray],
        example_offsets: List[Tuple[int, int]],
    ):
        self.segments = segments
        self.example_offsets = example_offsets


class SyncTrajectorySampler:
    """Synchronous (no background thread) variant of the buffered sampler.

    Parity with the in-line refill sampler of minecraft/sample_frames.py:
    49-143 — `sample_batch` blocks and rebuilds the buffer when exhausted.
    Useful for deterministic debugging and one-shot ETL jobs.
    """

    def __init__(
        self,
        source: TrajectorySource,
        buffer_size: int = 100_000,
        max_segment_length: int = 1000,
        traj_len: int = 16,
        skip_frames: int = 2,
        seed: int = 0,
        sample_divisor: int = 8,
    ):
        # reuse the buffered sampler's buffer builder without its thread
        self._inner = BufferedTrajectorySampler.__new__(
            BufferedTrajectorySampler
        )
        self._inner.source = source
        self._inner.buffer_size = buffer_size
        self._inner.max_segment_length = max_segment_length
        self._inner.traj_len = traj_len
        self._inner.skip_frames = skip_frames
        self._inner.sample_divisor = sample_divisor
        self._inner._stop = threading.Event()
        self._rng = np.random.default_rng(seed)
        self.traj_len = traj_len
        self._buffer: _Buffer | None = None
        self._cursor = 0

    def sample_batch(self, batch_size: int) -> np.ndarray:
        out = None
        for b in range(batch_size):
            while self._buffer is None or self._cursor >= len(
                self._buffer.example_offsets
            ):
                self._buffer = self._inner._build_buffer(self._rng)
                self._cursor = 0
            seg_idx, off = self._buffer.example_offsets[self._cursor]
            self._cursor += 1
            clip = self._buffer.segments[seg_idx][off : off + self.traj_len]
            if out is None:
                out = np.empty((batch_size,) + clip.shape, dtype=clip.dtype)
            out[b] = clip
        return out


class BufferedTrajectorySampler:
    """Double-buffered batch sampler over a TrajectorySource.

    Semantics follow buffered_traj_sampler.py:32-118: trajectories are
    visited in random permutation order, frames are kept every
    `skip_frames + 1` steps, a random segment of at most
    `max_segment_length` frames survives, and one training-example offset is
    drawn per 8 frames of each segment.
    """

    def __init__(
        self,
        source: TrajectorySource,
        buffer_size: int = 100_000,
        max_segment_length: int = 1000,
        traj_len: int = 16,
        skip_frames: int = 2,
        seed: int = 0,
        sample_divisor: int = 8,
    ):
        self.source = source
        self.buffer_size = buffer_size
        self.max_segment_length = max_segment_length
        self.traj_len = traj_len
        self.skip_frames = skip_frames
        self.sample_divisor = sample_divisor
        self._rng = np.random.default_rng(seed)
        self._queue: "queue.Queue[_Buffer]" = queue.Queue(maxsize=1)
        self._current: _Buffer | None = None
        self._cursor = 0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._fill_loop, daemon=True)
        self._thread.start()

    # -- producer ----------------------------------------------------------

    def _build_buffer(self, rng: np.random.Generator) -> _Buffer:
        names = list(self.source.trajectory_names())
        total_frames = 0
        segments: List[np.ndarray] = []
        offsets: List[Tuple[int, int]] = []
        order: List[int] = []
        i = 0
        while total_frames < self.buffer_size and not self._stop.is_set():
            if i >= len(order):
                order = list(rng.permutation(len(names)))
                i = 0
            name = names[order[i]]
            i += 1

            frames = []
            skip = 0
            for pov in self.source.load_frames(name):
                if skip > 0:
                    skip -= 1
                else:
                    frames.append(pov)
                    skip = self.skip_frames
            if len(frames) <= self.traj_len:
                continue

            max_offset = len(frames) - self.max_segment_length
            if max_offset > 0:
                begin = int(rng.integers(0, max_offset + 1))
                frames = frames[begin : begin + self.max_segment_length]

            seg_idx = len(segments)
            segments.append(np.stack(frames))
            total_frames += len(frames)

            n_examples = (len(frames) - self.traj_len) // self.sample_divisor
            for _ in range(n_examples):
                off = int(rng.integers(0, len(frames) - self.traj_len + 1))
                offsets.append((seg_idx, off))

        perm = rng.permutation(len(offsets))
        offsets = [offsets[int(k)] for k in perm]
        return _Buffer(segments, offsets)

    def _fill_loop(self):
        worker_rng = np.random.default_rng(self._rng.integers(2**63))
        while not self._stop.is_set():
            buf = self._build_buffer(worker_rng)
            while not self._stop.is_set():
                try:
                    self._queue.put(buf, timeout=0.5)
                    break
                except queue.Full:
                    continue

    # -- consumer ----------------------------------------------------------

    def _next_example(self) -> Tuple[int, int]:
        while self._current is None or self._cursor >= len(
            self._current.example_offsets
        ):
            self._current = self._queue.get()
            self._cursor = 0
        ex = self._current.example_offsets[self._cursor]
        self._cursor += 1
        return ex

    def sample_batch(self, batch_size: int) -> np.ndarray:
        """(B, traj_len, H, W, 3) uint8 (buffered_traj_sampler.py:104-118)."""
        out = None
        for b in range(batch_size):
            seg_idx, off = self._next_example()
            clip = self._current.segments[seg_idx][off : off + self.traj_len]
            if out is None:
                out = np.empty(
                    (batch_size,) + clip.shape, dtype=clip.dtype
                )
            out[b] = clip
        return out

    def close(self):
        self._stop.set()
        try:
            self._queue.get_nowait()
        except queue.Empty:
            pass


class TrajectoryClipDataset:
    """Random-access (Grain-compatible) clip view over a TrajectorySource.

    The samplers above are streaming: their shuffle/buffer state dies with
    the process, so a resumed run replays or skips data. This dataset
    instead makes record ``i`` a PURE function of ``(seed, i)`` — a
    per-index RNG picks the trajectory and the clip offset — which is
    exactly what Grain's random-access model needs for a deterministic,
    checkpointable, shardable stream (``--data_pipeline grain``).

    Decoding matches the buffered sampler: frames are kept every
    ``skip_frames + 1`` steps (reference buffered_traj_sampler.py:54-61)
    and a ``traj_len``-frame clip is sliced at the drawn offset. Decoded
    trajectories pass through a small LRU so a worker's consecutive
    records amortize the decode; with Grain worker processes each worker
    owns its own cache.
    """

    def __init__(
        self,
        source: TrajectorySource,
        traj_len: int = 16,
        skip_frames: int = 2,
        examples_per_epoch: int = 100_000,
        cache_size: int = 4,
        seed: int = 0,
        max_draws: int = 8,
    ):
        from collections import OrderedDict

        self.source = source
        self.traj_len = traj_len
        self.skip_frames = skip_frames
        self.seed = seed
        self.max_draws = max_draws
        self._n = examples_per_epoch
        self._names = list(source.trajectory_names())
        self._cache: "OrderedDict[str, np.ndarray]" = OrderedDict()
        self._cache_size = cache_size

    def __len__(self) -> int:
        return self._n

    def __repr__(self) -> str:
        # Grain validates repr(data_source) when restoring iterator
        # state; the default object repr embeds a memory address and
        # would reject every legitimate resume
        return (
            f"TrajectoryClipDataset(source={type(self.source).__name__},"
            f" n={self._n}, traj_len={self.traj_len},"
            f" skip={self.skip_frames}, seed={self.seed})"
        )

    def _decoded(self, name: str) -> np.ndarray:
        hit = self._cache.pop(name, None)
        if hit is not None:
            self._cache[name] = hit  # refresh LRU position
            return hit
        frames: List[np.ndarray] = []
        skip = 0
        for pov in self.source.load_frames(name):
            if skip > 0:
                skip -= 1
            else:
                frames.append(pov)
                skip = self.skip_frames
        arr = (
            np.stack(frames)
            if frames
            else np.empty((0, 1, 1, 3), np.uint8)
        )
        self._cache[name] = arr
        while len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return arr

    def __getitem__(self, i: int) -> np.ndarray:
        rng = np.random.default_rng(
            np.random.SeedSequence([self.seed, int(i)])
        )
        # per-index trajectory preference order; skip too-short ones the
        # same way the buffered sampler does (len <= traj_len: continue)
        order = rng.permutation(len(self._names))
        for t in order[: self.max_draws]:
            frames = self._decoded(self._names[int(t)])
            if len(frames) > self.traj_len:
                off = int(
                    rng.integers(0, len(frames) - self.traj_len + 1)
                )
                return frames[off : off + self.traj_len]
        raise ValueError(
            f"no trajectory longer than traj_len={self.traj_len} "
            f"(post-skip) in {self.max_draws} draws — shorten traj_len "
            f"or lower skip_frames"
        )
