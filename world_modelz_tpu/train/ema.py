"""Shadow-weights exponential moving average as a pure pytree op.

Replaces the reference's `ModelEmaV2` (minecraft/model_ema_v2.py:8-47), which
deep-copies the model and mutates its state dict in place. Here the EMA is
just a second pytree updated functionally, so it jits into the train step and
shards exactly like the parameters (SURVEY.md §2.2 table).
"""

from __future__ import annotations

from typing import Any

import jax


def ema_init(tree: Any) -> Any:
    """Start the shadow copy at the current values (model_ema_v2.py:29).

    Materializes distinct buffers (not aliases) so the shadow tree can be
    buffer-donated independently of the parameters in a jitted step.
    """
    import jax.numpy as jnp

    return jax.tree_util.tree_map(jnp.copy, tree)


def ema_update(ema_tree: Any, new_tree: Any, decay: float) -> Any:
    """ema = decay * ema + (1 - decay) * new (model_ema_v2.py:44)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * decay + p * (1.0 - decay), ema_tree, new_tree
    )
