"""Denoiser heads for masked discrete video diffusion.

Parity:
- `VqVideoDiffusionModel` (minecraft/main2.py:26-37 ≡
  vq-video-diffusion/main.py:25-36): local-3D-attention transformer over
  (n_past+1)-frame token grids with an extra mask class; logits predicted for
  the last frame only.
- `VqSparseDiffusionModel` (minecraft/sparse_diffusion.py:75-111): dense
  transformer over an arbitrary *subset* of space-time token positions,
  located by factorized 3D position embeddings decoded from flat indices.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

from world_modelz_tpu.models.attention import (
    DenseTransformer,
    Local3dAttentionTransformer,
)


class VqVideoDiffusionModel(nn.Module):
    """Next-frame masked-diffusion denoiser (main2.py:26-37).

    Input: (B, S, H, W) int tokens in [0, num_classes] (num_classes is the
    mask token). Output: (B, H, W, num_classes) logits for the last frame.
    """

    data_shape: Tuple[int, int, int]
    dim: int
    num_classes: int
    extents: Tuple[int, int, int]
    depth: int
    dim_head: int
    mlp_dim: int
    heads: int = 1
    dropout: float = 0.0
    use_checkpointing: bool = True
    backend: str = "auto"  # attention backend: "auto" | "xla" | "pallas"
    seq_axis: str = ""  # sequence parallelism (parallel/sequence.py)
    seq_mesh: object = None

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        x = Local3dAttentionTransformer(
            data_shape=self.data_shape,
            dim=self.dim,
            num_classes=self.num_classes + 1,  # + mask class (main2.py:30)
            extents=self.extents,
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            use_checkpointing=self.use_checkpointing,
            backend=self.backend,
            seq_axis=self.seq_axis,
            seq_mesh=self.seq_mesh,
            name="transformer",
        )(tokens, train=train)
        last_frames = x[:, -1]  # (B, H, W, dim) (main2.py:36)
        return nn.Dense(self.num_classes, name="logit_proj")(last_frames)


class VqSparseDiffusionModel(nn.Module):
    """Sparse space-time denoiser (sparse_diffusion.py:75-111).

    Input: tokens (B, N) int in [0, num_classes] and flat positions
    indices (B, N) into the S*H*W volume. Output: (B, N, num_classes) logits.
    """

    shape: Tuple[int, int, int]  # (S, H, W) of the full token volume
    dim: int
    num_classes: int
    depth: int
    dim_head: int
    mlp_dim: int
    heads: int = 1
    dropout: float = 0.0
    attn_backend: str = "auto"  # auto | flash | xla (DenseAttention)
    moe_experts: int = 0  # >0: expert-parallel MoE FFNs (new capability)
    moe_capacity_factor: float = 1.25
    moe_impl: str = "dispatch"

    def setup(self):
        s, h, w = self.shape
        self.pos_emb_s = nn.Embed(s, self.dim)
        self.pos_emb_h = nn.Embed(h, self.dim)
        self.pos_emb_w = nn.Embed(w, self.dim)
        self.embedding = nn.Embed(self.num_classes + 1, self.dim)
        self.transformer = DenseTransformer(
            depth=self.depth,
            heads=self.heads,
            dim_head=self.dim_head,
            mlp_dim=self.mlp_dim,
            dropout=self.dropout,
            attn_backend=self.attn_backend,
            moe_experts=self.moe_experts,
            moe_capacity_factor=self.moe_capacity_factor,
            moe_impl=self.moe_impl,
        )
        self.logit_proj = nn.Dense(self.num_classes)

    def pos_embedding_3d(self, indices: jnp.ndarray) -> jnp.ndarray:
        """Decode flat volume indices to factorized s/h/w embeddings
        (sparse_diffusion.py:100-105)."""
        _, h, w = self.shape
        w_pos = indices % w
        h_pos = (indices // w) % h
        s_pos = indices // (h * w)
        return (
            self.pos_emb_s(s_pos)
            + self.pos_emb_h(h_pos)
            + self.pos_emb_w(w_pos)
        )

    def __call__(
        self,
        tokens: jnp.ndarray,
        indices: jnp.ndarray,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        x = self.embedding(tokens) + self.pos_embedding_3d(indices)
        x = self.transformer(x, train=train)
        return self.logit_proj(x)
