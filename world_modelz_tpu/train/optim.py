"""Optimizer construction and gradient utilities.

Parity with the reference's Adam/AdamW switch (e.g.
minecraft/sparse_diffusion.py:369-384) via optax; the grad-norm monitor
replaces the per-parameter host-sync Python loop (minecraft/main2.py:200-205)
with a single fused on-device reduction.
"""

from __future__ import annotations

from typing import Union

import optax


def make_optimizer(
    name: str,
    learning_rate: Union[float, optax.Schedule],
    weight_decay: float = 0.0,
    b1: float = 0.9,
    b2: float = 0.999,
) -> optax.GradientTransformation:
    name = name.lower()
    if name == "adamw":
        return optax.adamw(
            learning_rate, b1=b1, b2=b2, weight_decay=weight_decay
        )
    if name == "adam":
        return optax.adam(learning_rate, b1=b1, b2=b2)
    raise ValueError(f"Unsupported optimizer: {name!r}")


def global_grad_norm(grads) -> "optax.base.chex.Array":
    """L2 norm over the whole gradient pytree (main2.py:200-205, on-device)."""
    return optax.global_norm(grads)
