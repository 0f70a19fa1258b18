"""Tracing / profiling helpers (SURVEY.md §5 'tracing').

The reference's only perf instrumentation is the Triton harness's wall-clock
timing (local_3d_attention_triton1.py:283-313). Here:

- :func:`trace` wraps a code region in a `jax.profiler` trace whose output
  loads in TensorBoard/XProf (per-op TPU timing, HBM usage);
- :func:`benchmark_fn` is the timed-loop harness used by the kernel and
  tokenizer benchmarks (block_until_ready around compiled calls);
- :func:`count_parameters` mirrors the reference helper
  (train_vqae.py:240-242) for pytrees.
"""

from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Tuple

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Profile a region: `with trace('outputs/trace'): step(...)`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def benchmark_fn(
    fn: Callable[..., Any],
    *args: Any,
    iters: int = 20,
    warmup: int = 1,
) -> Tuple[float, Any]:
    """Mean seconds per call of a (jitted) function, compile excluded.

    Caveat: on relayed/remote TPU backends `block_until_ready` may return at
    enqueue time, making this measure dispatch rate, not device time. For
    trustworthy numbers there, use :func:`benchmark_chained`.
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def benchmark_chained(
    step_fn: Callable[[Any], Any],
    x0: Any,
    iters_short: int = 5,
    iters_long: int = 25,
    trials: int = 3,
) -> float:
    """Honest per-iteration device time of `step_fn` (x -> x).

    Builds jitted programs scanning `step_fn` for two lengths, each ending in
    a scalar reduction whose VALUE is read back to the host (the bytes cannot
    arrive before compute completes), and differences the times to cancel
    constant RPC/readback overhead. Robust on relayed TPU backends where
    `block_until_ready` is an enqueue fence.
    """
    import functools

    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames="iters")
    def chained(x, iters):
        def body(x, _):
            return step_fn(x), ()

        final, _ = jax.lax.scan(body, x, None, length=iters)
        return jnp.sum(
            jnp.stack(
                [jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(final)]
            )
        )

    times = {}
    for iters in (iters_short, iters_long):
        float(chained(x0, iters))  # compile + warm
        best = float("inf")
        for _ in range(trials):
            t0 = time.perf_counter()
            float(chained(x0, iters))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    return (times[iters_long] - times[iters_short]) / (
        iters_long - iters_short
    )


def count_parameters(tree: Any, verbose: bool = True) -> int:
    """Total leaf elements of a parameter pytree (train_vqae.py:240-242)."""
    n = sum(x.size for x in jax.tree_util.tree_leaves(tree))
    if verbose:
        print(f"Number of parameters: {n}")
    return n
