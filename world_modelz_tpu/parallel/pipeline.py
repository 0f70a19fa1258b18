"""Pipeline parallelism: GPipe-style microbatch schedule over a mesh axis.

The reference is single-device (SURVEY.md §2.2), so — like the rest of
`parallel/` — this is new TPU-native design: the layer stack is split into
`n_stages` contiguous groups whose parameters live on different devices
along a ``'pipe'`` mesh axis, and microbatches stream through the stages via
``ppermute`` over ICI. The whole schedule is one ``lax.scan`` inside
``jax.shard_map``:

    tick t: every stage applies its block to the activation it holds,
            then passes the result to its right neighbour; stage 0 feeds
            microbatch t (while any remain), the last stage emits finished
            microbatches. After ``n_micro + n_stages - 1`` ticks all
            microbatches have drained.

Because ``scan``/``ppermute``/``psum`` are all linear-transposable, JAX
autodiff differentiates straight through the schedule — the backward pass
IS the reverse pipeline (right-to-left ppermutes in transposed order), with
no hand-written backward schedule. The classic GPipe bubble
(``(n_stages-1)/(n_micro + n_stages - 1)`` idle fraction) applies; choose
``n_micro >= 4 * n_stages`` to amortize.

Composes with data parallelism: put ``'pipe'`` first in the mesh and pass
``data_axis`` so microbatch rows stay sharded over ``'data'`` inside the
shard_map.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(stage_params: list) -> Any:
    """Stack per-stage parameter pytrees along a new leading 'stage' axis.

    All stages must share a tree structure and leaf shapes (homogeneous
    blocks — true for the transformer stacks in this package)."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *stage_params
    )


def pipeline_apply(
    block_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x_micro: jnp.ndarray,
    mesh: Mesh,
    axis: str = "pipe",
    data_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Run `x_micro` through the pipelined block stack.

    Args:
      block_fn: shape-preserving stage ``(params, (mb, ...)) -> (mb, ...)``.
        Applied once per stage; a stage's params may themselves contain a
        stacked sub-axis of layers consumed by an inner scan.
      stacked_params: pytree with leading axis ``n_stages`` (sharded over
        `axis` by this function's shard_map specs).
      x_micro: ``(n_micro, mb, ...)`` microbatched input.
      mesh: mesh containing `axis` (and optionally `data_axis`).
      data_axis: mesh axis sharding the microbatch row dim, if any.

    Returns:
      ``(n_micro, mb, ...)`` outputs, replicated over `axis`.
    """
    n_stages = mesh.shape[axis]
    n_micro = x_micro.shape[0]
    ticks = n_micro + n_stages - 1
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]

    x_spec = (
        P(None, data_axis) if data_axis is not None else P()
    )  # (micro, row, ...)
    p_spec = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)

    def staged(params, x_micro):
        # params arrive with a leading stage axis of local length 1
        params = jax.tree_util.tree_map(lambda p: p[0], params)
        stage = jax.lax.axis_index(axis)
        mb_shape = x_micro.shape[1:]
        zeros = jnp.zeros(mb_shape, x_micro.dtype)

        def tick(carry, t):
            held = carry
            # stage 0 ingests microbatch t (clamped once the feed drains —
            # those ticks only push bubbles through)
            feed = x_micro[jnp.minimum(t, n_micro - 1)]
            inp = jnp.where(stage == 0, feed, held)
            out = block_fn(params, inp)
            # emit BEFORE the rotate: microbatch m finishes at the last
            # stage on tick m + n_stages - 1
            emitted = jnp.where(stage == n_stages - 1, out, zeros)
            held = jax.lax.ppermute(out, axis, perm)
            return held, emitted

        _, emitted = jax.lax.scan(tick, zeros, jnp.arange(ticks))
        # (ticks, mb, ...) -> keep the n_micro finished ones, then make the
        # result stage-invariant (only the last stage held real values)
        outs = emitted[n_stages - 1 :]
        return jax.lax.psum(outs, axis)

    return jax.shard_map(
        staged,
        mesh=mesh,
        in_specs=(p_spec, x_spec),
        out_specs=x_spec,
        check_vma=False,
    )(stacked_params, x_micro)


def microbatch(x: jnp.ndarray, n_micro: int) -> jnp.ndarray:
    """(B, ...) -> (n_micro, B // n_micro, ...)."""
    b = x.shape[0]
    if b % n_micro:
        raise ValueError(f"batch {b} not divisible by n_micro {n_micro}")
    return x.reshape(n_micro, b // n_micro, *x.shape[1:])


def unmicrobatch(x: jnp.ndarray) -> jnp.ndarray:
    """(n_micro, mb, ...) -> (B, ...)."""
    return x.reshape(x.shape[0] * x.shape[1], *x.shape[2:])
