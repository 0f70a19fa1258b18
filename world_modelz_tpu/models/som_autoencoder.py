"""SOM-quantized convolutional autoencoder.

Parity with `SomAutoEncoder` (som-diffusion/autoencoder.py:156-193 and the
finetune variant at finetune_ae.py:22-49): the conv encoder/decoder pair from
the VQ tokenizer with a 2D self-organizing map in the bottleneck; encode_2d /
decode_2d map images to/from 2-channel latents in [-1,1]^2 (the continuous
representation the som-diffusion DDPM is trained on).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from flax.core import FrozenDict

from world_modelz_tpu.models.tokenizer import _AEModule
from world_modelz_tpu.ops.som import (
    SomState,
    som_decode_2d,
    som_encode_2d,
    som_forward,
    som_init,
)


@struct.dataclass
class SomTokenizerState:
    params: Any
    batch_stats: Any
    som: SomState


@dataclasses.dataclass(frozen=True)
class SomAutoEncoder:
    """Functional SOM autoencoder (config object; state passed explicitly)."""

    embedding_dim: int
    downscale_steps: int = 2
    hidden_planes: int = 128
    in_channels: int = 3
    som_width: int = 128
    som_height: int = 128
    pass_through_som: bool = False

    @property
    def module(self) -> _AEModule:
        return _AEModule(
            embedding_dim=self.embedding_dim,
            downscale_steps=self.downscale_steps,
            hidden_planes=self.hidden_planes,
            in_channels=self.in_channels,
        )

    def init(self, key: jax.Array, sample: jnp.ndarray) -> SomTokenizerState:
        k_ae, k_som = jax.random.split(key)
        variables = self.module.init(k_ae, sample, train=False)
        som = som_init(
            k_som,
            width=self.som_width,
            height=self.som_height,
            embedding_dim=self.embedding_dim,
        )
        return SomTokenizerState(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", FrozenDict()),
            som=som,
        )

    def resize_som(
        self, key: jax.Array, state: SomTokenizerState, width: int, height: int
    ) -> Tuple["SomAutoEncoder", SomTokenizerState]:
        """Reinitialize the SOM at a new size keeping the conv weights
        (train_som.py:168-173)."""
        cfg = dataclasses.replace(self, som_width=width, som_height=height)
        som = som_init(
            key, width=width, height=height, embedding_dim=self.embedding_dim
        )
        return cfg, state.replace(som=som)

    def _encode_h(
        self, state: SomTokenizerState, x: jnp.ndarray, *, train: bool
    ):
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        if train:
            h, mutated = self.module.apply(
                variables, x, train=True, method="encode",
                mutable=["batch_stats"],
            )
            return h, mutated["batch_stats"]
        return (
            self.module.apply(variables, x, train=False, method="encode"),
            state.batch_stats,
        )

    def _decode_h(
        self, state: SomTokenizerState, h: jnp.ndarray, *, train: bool,
        batch_stats=None,
    ):
        variables = {
            "params": state.params,
            "batch_stats": batch_stats
            if batch_stats is not None
            else state.batch_stats,
        }
        if train:
            y, mutated = self.module.apply(
                variables, h, train=True, method="decode",
                mutable=["batch_stats"],
            )
            return y, mutated["batch_stats"]
        return (
            self.module.apply(variables, h, train=False, method="decode"),
            variables["batch_stats"],
        )

    def forward(
        self, state: SomTokenizerState, x: jnp.ndarray, *, train: bool
    ):
        """(reconstruction, h_in, h_diff, new_state) — the finetune forward
        (finetune_ae.py:34-49); h_diff is None when the SOM is bypassed."""
        h, bs = self._encode_h(state, x, train=train)
        h_in = h
        if self.pass_through_som:
            h, h_diff = som_forward(state.som, h)
        else:
            h_diff = None
        recon, bs = self._decode_h(state, h, train=train, batch_stats=bs)
        return recon, h_in, h_diff, state.replace(batch_stats=bs)

    def encode_2d(self, state: SomTokenizerState, x: jnp.ndarray) -> jnp.ndarray:
        """Images -> (B, h, w, 2) normalized SOM coordinates
        (autoencoder.py:168-171; channels-last here)."""
        h, _ = self._encode_h(state, x, train=False)
        return som_encode_2d(state.som, h)

    def decode_2d(self, state: SomTokenizerState, pos: jnp.ndarray) -> jnp.ndarray:
        """(B, h, w, 2) coordinates -> images (autoencoder.py:173-176)."""
        h = som_decode_2d(state.som, pos)
        y, _ = self._decode_h(state, h, train=False)
        return y

    def encode_latent(
        self, state: SomTokenizerState, x: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        """Raw conv features (pre-SOM), for som.adapt during SOM fitting
        (train_som.py:82-97)."""
        h, _ = self._encode_h(state, x, train=train)
        return h
