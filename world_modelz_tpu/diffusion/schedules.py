"""Named diffusion-time noise schedules.

Parity with the masked-denoise prototype's `named_schedule`
(masked_denoise_prototype/main.py:323-337): warps r ~ U[0,1] through cosine
powers to bias training toward chosen corruption levels.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp


def _cos(r: jnp.ndarray) -> jnp.ndarray:
    # clamp at 0: f32 cos(pi/2) can be slightly negative, which NaNs the
    # fractional powers (cos05) — a latent bug in the reference's torch
    # version too (masked_denoise_prototype/main.py:330)
    return jnp.maximum(jnp.cos((r + 0.01) / 1.01 * math.pi * 0.5), 0.0)


_SCHEDULES: dict = {
    "linear": lambda r: r,
    "cos1": _cos,
    "cos2": lambda r: _cos(r) ** 2,
    "cos05": lambda r: _cos(r) ** 0.5,
    "cos3": lambda r: _cos(r) ** 3,
    "cos2_inv": lambda r: 1.0 - _cos(r) ** 2,
    "cos3_inv": lambda r: 1.0 - _cos(r) ** 3,
}


def named_schedule(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    try:
        return _SCHEDULES[name]
    except KeyError:
        raise ValueError(
            f"unknown schedule {name!r}; available: {sorted(_SCHEDULES)}"
        ) from None
