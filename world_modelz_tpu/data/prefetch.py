"""Host->device prefetching.

The reference keeps the accelerator waiting on Python data work every step
(SURVEY.md §3.2). `PrefetchIterator` decouples them: a background thread
assembles host batches into a bounded queue and (optionally) ships them to
device ahead of time, so `next()` usually returns a ready on-device batch.
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Any, Callable, Iterator, Optional

import jax


class PrefetchIterator:
    """Wrap a host batch iterator with background prefetch + device put.

    Args:
      make_batch: callable returning the next host batch (numpy pytree).
      depth: number of batches to keep in flight.
      device_put: if True, batches are `jax.device_put` from the worker
        thread so the transfer overlaps device compute.
      sharding: optional `jax.sharding.Sharding` for the device placement
        (e.g. batch-sharded over a data mesh axis).
      state_fn: optional callable returning the source iterator's
        checkpoint state. It is called ONLY from the worker thread,
        immediately after each `make_batch` (so it never races the
        iterator), and the snapshot rides the queue with its batch.
        `consumed_state()` then returns the state as of the last batch
        the consumer actually took — not the prefetched-ahead position,
        which would skip up to `depth`+1 batches on resume.
      probe_every: if > 0, every Nth `device_put` is value-fenced (one
        element of the shipped batch is read back) and timed, measuring
        the host->device transfer the async pipeline otherwise hides —
        the trainer timing report (train/timing.py) ingests the stats.
        The fence briefly serializes the worker; keep N large.
    """

    _SENTINEL = object()

    def __init__(
        self,
        make_batch: Callable[[], Any],
        depth: int = 2,
        device_put: bool = True,
        sharding: Optional[Any] = None,
        state_fn: Optional[Callable[[], Any]] = None,
        probe_every: int = 0,
    ):
        self._make_batch = make_batch
        self._device_put = device_put
        self._sharding = sharding
        self._state_fn = state_fn
        self._probe_every = int(probe_every)
        self._n_put = 0
        self._h2d: list = []  # (bytes, seconds) fenced transfer timings
        # position before any batch is consumed (thread not started yet)
        self._consumed_state = state_fn() if state_fn is not None else None
        self._queue: "queue.Queue[Any]" = queue.Queue(maxsize=depth)
        self._stop = threading.Event()
        self._error: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while not self._stop.is_set():
            try:
                batch = self._make_batch()
                state = (
                    self._state_fn() if self._state_fn is not None else None
                )
                if self._device_put:
                    self._n_put += 1
                    probe = (
                        self._probe_every > 0
                        and self._n_put % self._probe_every == 0
                    )
                    t0 = time.perf_counter() if probe else 0.0
                    if self._sharding is not None:
                        batch = jax.device_put(batch, self._sharding)
                    else:
                        batch = jax.device_put(batch)
                    if probe:
                        from world_modelz_tpu.train.timing import fence_value

                        leaves = jax.tree_util.tree_leaves(batch)
                        for leaf in leaves:
                            fence_value(leaf)
                        nbytes = sum(
                            getattr(x, "nbytes", 0) for x in leaves
                        )
                        self._h2d.append(
                            (nbytes, time.perf_counter() - t0)
                        )
            except BaseException as e:  # propagate to consumer
                self._error = e
                self._put(self._SENTINEL)
                return
            self._put((batch, state))

    def _put(self, item):
        while not self._stop.is_set():
            try:
                self._queue.put(item, timeout=0.5)
                return
            except queue.Full:
                continue

    def __iter__(self) -> Iterator[Any]:
        return self

    def __next__(self):
        item = self._queue.get()
        if item is self._SENTINEL:
            raise self._error if self._error else StopIteration
        batch, state = item
        if state is not None:
            self._consumed_state = state
        return batch

    def consumed_state(self):
        """Source-iterator state as of the last consumed batch (or the
        initial position if none consumed yet); None without state_fn."""
        return self._consumed_state

    def transfer_stats(self):
        """Fenced host->device transfer stats (None if never probed)."""
        if not self._h2d:
            return None
        times = sorted(t for _, t in self._h2d)
        med = times[len(times) // 2]
        mb = self._h2d[-1][0] / 1e6
        return {
            "n_probes": len(self._h2d),
            "h2d_ms_per_batch": round(med * 1e3, 3),
            "mb_per_batch": round(mb, 3),
            "mb_per_sec": round(mb / max(med, 1e-9), 1),
            "note": "fenced device_put of one prefetched batch (worker "
            "thread); steady-state puts are async and may overlap compute",
        }

    def close(self):
        self._stop.set()
        try:
            while True:
                self._queue.get_nowait()
        except queue.Empty:
            pass
