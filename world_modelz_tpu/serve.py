"""Batched continuous rollout service (the production "serve" path).

The reference's closest analog is `evaluate_model` re-entered from Python
per eval (SURVEY.md §3.4) — one clip at a time, no batching, host round
trips between denoise iterations. This service is the TPU-native serving
design:

- ONE jitted program (frozen-tokenizer encode -> scan'd iterative-unmask
  rollout -> decode) compiled once for a fixed batch size; no recompiles.
- Requests enqueue from any thread; a worker coalesces up to `batch_size`
  of them (waiting at most `max_wait_s` after the first), pads short
  batches by repetition, runs the program, and resolves per-request
  futures with their slice.
- Everything between submit and result is a single device program — the
  30-iteration x num_frames sampling loop never re-enters Python
  (diffusion/masked.py `rollout_frames`).

Example:
    svc = RolloutService(tok, tok_state, model, params, num_frames=8)
    futs = [svc.submit(clip) for clip in clips]   # (S, H, W, C) each
    videos = [f.result() for f in futs]           # (T, H, W, C) each
    svc.close()
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import Future
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np


class RolloutService:
    """Request-coalescing batched video rollout.

    Args:
      tok / tok_state: frozen `VQAutoEncoder` + state (the tokenizer).
      model / params: denoiser (`VqVideoDiffusionModel`) + params.
      num_frames: generated frames per request.
      num_iterations: unmask iterations per frame (main2.py:81 uses 30).
      sample_topk: top-k logit truncation (-1 = off).
      batch_size: compiled batch size (the coalescing limit).
      max_wait_s: max time the worker waits to fill a batch after the
        first request arrives.
      seed: PRNG seed for the sampling key stream.
    """

    def __init__(
        self,
        tok: Any,
        tok_state: Any,
        model: Any,
        params: Any,
        *,
        num_frames: int,
        num_iterations: int = 30,
        sample_topk: int = -1,
        batch_size: int = 8,
        max_wait_s: float = 0.05,
        seed: int = 0,
    ):
        from world_modelz_tpu.diffusion import rollout_frames

        self._tok = tok
        self._tok_state = tok_state
        self._params = params
        self._batch_size = int(batch_size)
        self._max_wait_s = float(max_wait_s)
        self._queue: "queue.Queue" = queue.Queue()
        self._key = jax.random.PRNGKey(seed)
        self._closed = False
        self.stats = {"requests": 0, "batches": 0, "batched_rows": 0}

        k = tok.num_embeddings

        def program(params, tok_state, seeds, key):
            b, s, h, w, c = seeds.shape
            tokens = tok.encode(tok_state, seeds.reshape(b * s, h, w, c))
            tokens = tokens.reshape(b, s, *tokens.shape[1:])
            gen = rollout_frames(
                key,
                lambda z: model.apply({"params": params}, z),
                tokens,
                num_frames=num_frames,
                num_classes=k,
                mask_token=k,
                num_iterations=num_iterations,
                sample_topk=sample_topk,
            )  # (B, T, th, tw)
            t = gen.shape[1]
            decoded = tok.decode(
                tok_state, gen.reshape(b * t, *gen.shape[2:])
            )
            return decoded.reshape(b, t, *decoded.shape[1:])

        self._program = jax.jit(program)
        self._lifecycle = threading.Lock()  # orders submit() vs close()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def submit(self, seed_clip: np.ndarray) -> Future:
        """Enqueue one (S, H, W, C) seed clip; resolves to (T, H, W, C)."""
        fut: Future = Future()
        # the lock makes closed-check + enqueue atomic w.r.t. close(): no
        # request can land behind the shutdown signal and starve its future
        with self._lifecycle:
            if self._closed:
                raise RuntimeError("service is closed")
            self._queue.put((np.asarray(seed_clip), fut))
        return fut

    def _take_batch(self):
        """Block for the first request, then coalesce up to batch_size."""
        first = self._queue.get()
        if first is None:
            return None
        batch = [first]
        deadline = _now() + self._max_wait_s
        while len(batch) < self._batch_size:
            timeout = deadline - _now()
            if timeout <= 0:
                break
            try:
                item = self._queue.get(timeout=timeout)
            except queue.Empty:
                break
            if item is None:
                self._queue.put(None)  # keep the shutdown signal
                break
            batch.append(item)
        return batch

    def _run(self):
        while True:
            batch = self._take_batch()
            if batch is None:
                return
            clips = [c for c, _ in batch]
            futs = [f for _, f in batch]
            try:
                n = len(clips)
                # pad to the compiled batch size by repetition
                while len(clips) < self._batch_size:
                    clips.append(clips[-1])
                seeds = jnp.asarray(np.stack(clips))
                self._key, sub = jax.random.split(self._key)
                out = np.asarray(
                    self._program(
                        self._params, self._tok_state, seeds, sub
                    )
                )
                self.stats["requests"] += n
                self.stats["batches"] += 1
                self.stats["batched_rows"] += self._batch_size
                for i, fut in enumerate(futs):
                    # a client may have cancel()ed a queued future; resolving
                    # it would raise InvalidStateError and poison the rest of
                    # the batch via the except below
                    if not fut.cancelled():
                        fut.set_result(out[i])
            except Exception as e:  # propagate to every waiter
                for fut in futs:
                    if not fut.done():
                        fut.set_exception(e)

    def close(self):
        """Drain and stop the worker; pending requests still complete."""
        with self._lifecycle:
            if self._closed:
                return
            self._closed = True
            self._queue.put(None)
        self._worker.join()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def _now() -> float:
    import time

    return time.monotonic()
