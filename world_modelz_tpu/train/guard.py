"""Training failure detection and recovery.

The reference has no failure handling beyond manual `--checkpoint` restarts
(SURVEY.md §5 'failure detection'). This module adds the standard production
guards for long TPU runs:

- :func:`finite_guard` — a jit-able combinator: if the new state contains any
  non-finite leaf (NaN/Inf loss spike, optimizer blow-up), the step is
  *rejected* and the previous state returned unchanged, with a flag for the
  host loop to log/count.
- :class:`RestartManager` — host-side: tracks consecutive rejected steps and
  decides when to restore from the last good checkpoint (the automated
  version of the reference's manual restart contract, main.py:366-372).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp


def tree_all_finite(tree: Any) -> jnp.ndarray:
    """Scalar bool: every array leaf of `tree` is finite."""
    leaves = [
        jnp.all(jnp.isfinite(x))
        for x in jax.tree_util.tree_leaves(tree)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
    ]
    if not leaves:
        return jnp.bool_(True)
    return jnp.all(jnp.stack(leaves))


def finite_guard(
    old_state: Any, new_state: Any
) -> Tuple[Any, jnp.ndarray]:
    """Return (new_state if finite else old_state, accepted flag).

    Both states must share a pytree structure. Designed to wrap the output of
    a jitted train step:

        new_state = step(state, batch)
        state, ok = finite_guard(state, new_state)
    """
    ok = tree_all_finite(new_state)
    guarded = jax.tree_util.tree_map(
        lambda old, new: jnp.where(ok, new, old), old_state, new_state
    )
    return guarded, ok


def reject_nonfinite(ok: jnp.ndarray, old: Any, new: Any) -> Any:
    """On-device step rejection with a precomputed verdict: keep every leaf
    of `old` wherever the scalar `ok` is False.

    The in-step companion of :func:`finite_guard` for trainers that derive
    `ok` from loss/grad-norm scalars they already have (cheaper than
    re-scanning the whole state tree)."""
    return jax.tree_util.tree_map(
        lambda o, n: jnp.where(ok, n, o), old, new
    )


class CheckpointGuard:
    """Host-side wiring of :class:`RestartManager` to a restore callback.

    Trainers keep the NaN rejection itself on-device (a `jnp.where` over the
    step's output state) and only sample the accepted flag at log points to
    avoid per-step host syncs. This class consumes those sampled flags:
    after `max_rejects` consecutive rejected sync points, `restore_fn()` is
    invoked (reload the last good checkpoint) and its result returned so the
    loop can swap in the restored state; otherwise `record` returns None.

    Automates the reference's manual crash-restart contract
    (minecraft/main2.py:219-231 `--checkpoint` resume by hand).
    """

    def __init__(self, restore_fn, max_rejects: int = 5):
        self.manager = RestartManager(max_rejects)
        self.restore_fn = restore_fn

    def record(self, accepted: bool, step: int = -1):
        self.manager.record(bool(accepted))
        if self.manager.should_restore():
            print(
                f"[guard] {self.manager.max_rejects} consecutive rejected "
                f"sync points at step {step}; restoring last checkpoint"
            )
            return self.restore_fn()
        return None


class RestartManager:
    """Escalate from step rejection to checkpoint restore.

    Args:
      max_rejects: consecutive rejected steps tolerated before
        `should_restore()` turns True (then counters reset).
    """

    def __init__(self, max_rejects: int = 10):
        self.max_rejects = max_rejects
        self.consecutive_rejects = 0
        self.total_rejects = 0
        self.restores = 0

    def record(self, accepted: bool) -> None:
        if accepted:
            self.consecutive_rejects = 0
        else:
            self.consecutive_rejects += 1
            self.total_rejects += 1

    def should_restore(self) -> bool:
        if self.consecutive_rejects >= self.max_rejects:
            self.consecutive_rejects = 0
            self.restores += 1
            return True
        return False
