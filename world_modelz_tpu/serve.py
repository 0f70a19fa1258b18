"""Batched continuous rollout service (the production "serve" path).

The reference's closest analog is `evaluate_model` re-entered from Python
per eval (SURVEY.md §3.4) — one clip at a time, no batching, host round
trips between denoise iterations. This service is the TPU-native serving
design:

- TWO jitted programs: a seed-clip ENCODER (pixels -> token context) and a
  fused ROLLOUT (scan'd iterative-unmask over the token grid -> decode to
  pixels + the UPDATED token context). The 30-iteration x num_frames
  sampling loop never re-enters Python (diffusion/masked.py
  `rollout_frames`).
- Requests enqueue from any thread; a worker coalesces up to `batch_size`
  of them (waiting at most `max_wait_s` after the first) and runs the
  rollout at the smallest compiled size in a power-of-two ladder that fits
  the batch — low-occupancy batches no longer pay full-batch compute
  (`stats["padded_rows"]` tracks the remaining waste).
- Streaming sessions (`open_session`): the seed clip is encoded ONCE; each
  `generate()` feeds the session's cached token context and receives the
  rolled context back from the device — no pixel re-upload and no
  re-encode per step (the round-2 service re-encoded the full seed clip
  every batch).

Example:
    svc = RolloutService(tok, tok_state, model, params, num_frames=8)
    futs = [svc.submit(clip) for clip in clips]   # (S, H, W, C) each
    videos = [f.result() for f in futs]           # (T, H, W, C) each

    sess = svc.open_session(clip)                 # encode once
    a = sess.generate()                           # (T, H, W, C)
    b = sess.generate()                           # continues from a
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


def rolled_context(tokens: jnp.ndarray, gen: jnp.ndarray) -> jnp.ndarray:
    """Context for the NEXT rollout call after generating `gen`.

    `rollout_frames` shifts its context one frame per generated frame,
    keeping the last (generation-slot) frame in place (main2.py:128-129);
    this reproduces the final carry from (tokens (B,S,th,tw), gen
    (B,T,th,tw)) so streaming sessions can continue without re-encoding.
    """
    s = tokens.shape[1]
    if s == 1:
        # context is just the generation slot — nothing to shift
        return tokens
    full = jnp.concatenate([tokens[:, :-1], gen], axis=1)
    return jnp.concatenate([full[:, -(s - 1):], tokens[:, -1:]], axis=1)


class RolloutSession:
    """A streaming rollout whose token context lives with the service.

    One generate() may be in flight at a time (the context of call N+1 is
    the output of call N).
    """

    def __init__(self, svc: "RolloutService", context_tokens: np.ndarray):
        self._svc = svc
        self._ctx = context_tokens  # (S, th, tw) int
        self._inflight: Optional[Future] = None
        self._lock = threading.Lock()

    def generate_async(self) -> Future:
        """Enqueue the next segment; resolves to (T, H, W, C) pixels."""
        with self._lock:
            if self._inflight is not None and not self._inflight.done():
                raise RuntimeError(
                    "session already has a generate() in flight"
                )
            fut = self._svc._submit_tokens(self._ctx, self)
            self._inflight = fut
            return fut

    def generate(self) -> np.ndarray:
        return self.generate_async().result()

    def _update(self, new_ctx: np.ndarray) -> None:
        self._ctx = new_ctx


class RolloutService:
    """Request-coalescing batched video rollout.

    Args:
      tok / tok_state: frozen `VQAutoEncoder` + state (the tokenizer).
      model / params: denoiser (`VqVideoDiffusionModel`) + params.
      num_frames: generated frames per request.
      num_iterations: unmask iterations per frame (main2.py:81 uses 30).
      sample_topk: top-k logit truncation (-1 = off).
      batch_size: max coalesced batch; compiled sizes are the powers of two
        up to it (lazily, first use of each size pays its compile).
      max_wait_s: max time the worker waits to fill a batch after the
        first request arrives.
      adaptive_wait: skip the coalescing wait when the EWMA request
        arrival rate cannot fill the batch within max_wait_s anyway — a
        lone request on a mostly-idle service is served immediately
        instead of idling the device for the full wait. Off by default:
        it trades coalescing strength right after bursts follow idle
        periods (the EWMA sees the idle gap) for tail latency.
      seed: PRNG seed for the sampling key stream.
    """

    def __init__(
        self,
        tok: Any = None,
        tok_state: Any = None,
        model: Any = None,
        params: Any = None,
        *,
        num_frames: Optional[int] = None,
        num_iterations: int = 30,
        sample_topk: int = -1,
        batch_size: Optional[int] = None,
        max_wait_s: float = 0.05,
        adaptive_wait: bool = False,
        seed: int = 0,
        programs: Any = None,  # aot.AOTPrograms: serve WITHOUT model code
    ):
        from world_modelz_tpu.diffusion import rollout_frames

        self._tok = tok
        self._tok_state = tok_state
        self._params = params
        if programs is not None:
            # AOT artifact: frames/iterations/ladder are baked into the
            # exported programs; the caller may only CAP the batch size
            if batch_size is None:
                batch_size = max(programs.sizes)
            num_frames = programs.meta["num_frames"]
        elif num_frames is None:
            raise TypeError("num_frames is required without `programs`")
        elif batch_size is None:
            batch_size = 8
        self.num_frames = int(num_frames)
        self._batch_size = int(batch_size)
        self._max_wait_s = float(max_wait_s)
        self._adaptive_wait = bool(adaptive_wait)
        self._queue: "queue.Queue" = queue.Queue()
        self._key = jax.random.PRNGKey(seed)
        self._closed = False
        self.stats = {
            "requests": 0,
            "batches": 0,
            "batched_rows": 0,  # rows actually run (compiled-size total)
            "padded_rows": 0,  # rows wasted on padding
            "encoded_clips": 0,  # pixel seed clips pushed through encode
            "session_rows": 0,  # rows served from cached token contexts
            "expired": 0,  # requests shed at their queue deadline
            "wait_skipped": 0,  # batches run early (arrival-rate adaptive)
        }
        # EWMA of request inter-arrival time: lets the worker skip the
        # coalescing wait when the observed rate cannot fill the batch
        # within max_wait_s anyway (a lone request on an idle service no
        # longer pays the full wait)
        self._ewma_gap: Optional[float] = None
        self._last_arrival: Optional[float] = None

        if programs is not None:
            self._encode_call = programs.encode
            self._rollout_call = programs.rollout
            self._sizes = sorted(
                s for s in programs.sizes if s <= self._batch_size
            )
            if not self._sizes:
                raise ValueError(
                    f"batch_size {batch_size} below every exported size "
                    f"{programs.sizes}"
                )
        else:
            k = tok.num_embeddings

            def encode_program(tok_state, seeds):
                b, s, h, w, c = seeds.shape
                tokens = tok.encode(
                    tok_state, seeds.reshape(b * s, h, w, c)
                )
                return tokens.reshape(b, s, *tokens.shape[1:])

            def rollout_program(params, tok_state, tokens, key):
                b = tokens.shape[0]
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
                decoded = decoded.reshape(b, t, *decoded.shape[1:])
                return decoded, rolled_context(tokens, gen)

            _encode = jax.jit(encode_program)
            _rollout = jax.jit(rollout_program)
            self._encode_call = lambda seeds: _encode(
                self._tok_state, seeds
            )
            self._rollout_call = lambda tokens, key: _rollout(
                self._params, self._tok_state, tokens, key
            )
            # compiled-size ladder: powers of two up to batch_size
            sizes = []
            s = 1
            while s < self._batch_size:
                sizes.append(s)
                s *= 2
            sizes.append(self._batch_size)
            self._sizes = sorted(set(sizes))
        self._lifecycle = threading.Lock()  # orders submit() vs close()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------ API

    def submit(
        self, seed_clip: np.ndarray, timeout_s: Optional[float] = None
    ) -> Future:
        """Enqueue one (S, H, W, C) seed clip; resolves to (T, H, W, C).

        With `timeout_s`, a request still queued when its deadline passes
        resolves to a `TimeoutError` instead of occupying a batch row —
        under overload the service sheds stale work rather than serving
        every request late (`stats["expired"]` counts shed requests).
        """
        return self._enqueue(
            ("pixels", np.asarray(seed_clip), None), timeout_s
        )

    def open_session(self, seed_clip: np.ndarray) -> RolloutSession:
        """Encode the seed clip once; stream segments via the session."""
        seeds = jnp.asarray(np.asarray(seed_clip)[None])
        ctx = np.asarray(self._encode_call(seeds))[0]
        self.stats["encoded_clips"] += 1
        return RolloutSession(self, ctx)

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

    # ------------------------------------------------------------- internals

    def _submit_tokens(self, ctx: np.ndarray, session: RolloutSession) -> Future:
        return self._enqueue(("tokens", np.asarray(ctx), session))

    def _enqueue(self, item, timeout_s: Optional[float] = None) -> Future:
        fut: Future = Future()
        deadline = _now() + timeout_s if timeout_s is not None else None
        # the lock makes closed-check + enqueue atomic w.r.t. close(): no
        # request can land behind the shutdown signal and starve its future
        with self._lifecycle:
            if self._closed:
                raise RuntimeError("service is closed")
            now = _now()
            if self._last_arrival is not None:
                gap = now - self._last_arrival
                self._ewma_gap = (
                    gap
                    if self._ewma_gap is None
                    else 0.7 * self._ewma_gap + 0.3 * gap
                )
            self._last_arrival = now
            self._queue.put((item, fut, deadline))
        return fut

    def _expired(self, entry) -> bool:
        """Resolve a past-deadline queued request; True if it was shed.
        (Once a request makes it into a running batch it always completes —
        the deadline bounds QUEUE time, the controllable part.)"""
        _item, fut, deadline = entry
        if deadline is None or _now() < deadline:
            return False
        if not fut.cancelled():
            fut.set_exception(
                TimeoutError("request expired before a batch slot opened")
            )
        self.stats["expired"] += 1
        return True

    def _take_batch(self):
        """Block for the first live request, then coalesce up to
        batch_size, shedding requests whose queue deadline has passed."""
        while True:
            first = self._queue.get()
            if first is None:
                return None
            if not self._expired(first):
                break
        batch = [first]
        # always coalesce what is ALREADY queued (free), then decide
        # whether waiting for more can plausibly pay off
        while len(batch) < self._batch_size:
            try:
                entry = self._queue.get_nowait()
            except queue.Empty:
                break
            if entry is None:
                self._queue.put(None)  # keep the shutdown signal
                return batch
            if not self._expired(entry):
                batch.append(entry)
        gap = self._ewma_gap
        if (
            self._adaptive_wait
            and len(batch) < self._batch_size
            and gap is not None
            and (self._batch_size - len(batch)) * gap > self._max_wait_s
        ):
            # observed arrival rate cannot fill the batch inside the wait
            # budget: run what we have now instead of idling the device
            self.stats["wait_skipped"] += 1
            return batch
        deadline = _now() + self._max_wait_s
        while len(batch) < self._batch_size:
            timeout = deadline - _now()
            if timeout <= 0:
                break
            try:
                entry = self._queue.get(timeout=timeout)
            except queue.Empty:
                break
            if entry is None:
                self._queue.put(None)  # keep the shutdown signal
                break
            if not self._expired(entry):
                batch.append(entry)
        return batch

    def _prog_size(self, n: int) -> int:
        for s in self._sizes:
            if s >= n:
                return s
        return self._batch_size

    def _run(self):
        while True:
            batch = self._take_batch()
            if batch is None:
                return
            items = [it for it, _f, _d in batch]
            futs = [f for _it, f, _d in batch]
            try:
                n = len(items)
                size = self._prog_size(n)

                # pixel requests: encode their seed clips (one padded call)
                pix_idx = [i for i, it in enumerate(items) if it[0] == "pixels"]
                contexts: list = [None] * n
                if pix_idx:
                    clips = [items[i][1] for i in pix_idx]
                    m = len(clips)
                    psize = self._prog_size(m)
                    while len(clips) < psize:
                        clips.append(clips[-1])
                    enc = np.asarray(
                        self._encode_call(jnp.asarray(np.stack(clips)))
                    )
                    for j, i in enumerate(pix_idx):
                        contexts[i] = enc[j]
                    self.stats["encoded_clips"] += m
                for i, it in enumerate(items):
                    if it[0] == "tokens":
                        contexts[i] = it[1]
                        self.stats["session_rows"] += 1

                ctxs = list(contexts)
                while len(ctxs) < size:
                    ctxs.append(ctxs[-1])
                tokens = jnp.asarray(np.stack(ctxs))
                self._key, sub = jax.random.split(self._key)
                out, new_ctx = self._rollout_call(tokens, sub)
                out = np.asarray(out)
                new_ctx = np.asarray(new_ctx)
                self.stats["requests"] += n
                self.stats["batches"] += 1
                self.stats["batched_rows"] += size
                self.stats["padded_rows"] += size - n
                for i, fut in enumerate(futs):
                    session = items[i][2]
                    if session is not None:
                        session._update(new_ctx[i])
                    # a client may have cancel()ed a queued future; resolving
                    # it would raise InvalidStateError and poison the rest of
                    # the batch via the except below
                    if not fut.cancelled():
                        fut.set_result(out[i])
            except Exception as e:  # propagate to every waiter
                for fut in futs:
                    if not fut.done():
                        fut.set_exception(e)


def _now() -> float:
    import time

    return time.monotonic()
