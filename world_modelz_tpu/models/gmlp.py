"""gMLP with spatial gating units and optional tiny attention.

Parity with masked_denoise_prototype/gmlp.py:30-175 (a g-mlp-pytorch
derivative): Residual(PreNorm(gMLPBlock)) stacks where each block projects up
(dim -> dim_ff), splits channels into (residual, gate), mixes the gate along
the *token* axis with a learned (seq, seq) map initialized near zero with
unit bias (:77-83), optionally adds a small single-head attention path into
the gate (:121, :127), and projects back down. Supports stochastic layer
drop (`prob_survival`, :13-26) and the prototype's VQ-embedding input
projection (:161, :167-171).

TPU note: the reference's nn.Conv1d(seq, seq, 1) over tokens is just a dense
(seq, seq) matmul along the sequence axis — expressed here as einsum on the
MXU. Layer drop uses a per-layer Bernoulli keep under the 'layer_drop' rng
collection; the reference additionally forces >= 1 surviving layer, which is
data-dependent — with the default prob_survival=1.0 both are identity.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class TinyAttention(nn.Module):
    """Single-head attention feeding the gate (gmlp.py:48-68)."""

    dim_inner: int
    dim_out: int
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        qkv = nn.Dense(self.dim_inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        sim = jnp.einsum(
            "bid,bjd->bij", q, k, preferred_element_type=jnp.float32
        ) * (self.dim_inner**-0.5)
        if self.causal:
            n = x.shape[1]
            mask = jnp.triu(jnp.ones((n, n), bool), 1)
            sim = jnp.where(mask[None], -jnp.inf, sim)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bij,bjd->bid", attn.astype(v.dtype), v)
        return nn.Dense(self.dim_out, name="to_out")(out)


class SpatialGatingUnit(nn.Module):
    """Split channels; gate half mixed across tokens (gmlp.py:70-102)."""

    seq_len: int
    causal: bool = False
    init_eps: float = 1e-3

    @nn.compact
    def __call__(self, x, gate_res: Optional[jnp.ndarray] = None):
        res, gate = jnp.split(x, 2, axis=-1)
        gate = nn.LayerNorm()(gate)

        eps = self.init_eps / self.seq_len
        weight = self.param(
            "proj_weight",
            nn.initializers.uniform(scale=2 * eps),
            (self.seq_len, self.seq_len),
        ) - eps  # uniform(-eps, eps) (gmlp.py:82)
        bias = self.param(
            "proj_bias", nn.initializers.ones, (self.seq_len,)
        )
        if self.causal:
            mask = jnp.tril(jnp.ones((self.seq_len, self.seq_len), bool))
            weight = jnp.where(mask, weight, 0.0)
        # token-axis mix: (B, N, C/2) x (N, N)
        gate = (
            jnp.einsum(
                "bnc,mn->bmc", gate, weight,
                preferred_element_type=jnp.float32,
            ).astype(x.dtype)
            + bias[None, :, None]
        )
        if gate_res is not None:
            gate = gate + gate_res
        return gate * res


class GMLPBlock(nn.Module):
    dim_ff: int
    seq_len: int
    attn_dim: Optional[int] = None
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        gate_res = (
            TinyAttention(
                dim_inner=self.attn_dim,
                dim_out=self.dim_ff // 2,
                causal=self.causal,
            )(x)
            if self.attn_dim
            else None
        )
        x = nn.Dense(self.dim_ff)(x)
        x = nn.gelu(x)
        x = SpatialGatingUnit(self.seq_len, causal=self.causal)(x, gate_res)
        return nn.Dense(dim)(x)


class GMLP(nn.Module):
    """Token-in/logits-out gMLP (gmlp.py:136-175)."""

    num_tokens_in: int
    num_tokens_out: int
    dim: int
    depth: int
    seq_len: int
    vq_embedding_dim: Optional[int] = None
    ff_mult: int = 4
    attn_dim: Optional[int] = None
    prob_survival: float = 1.0
    causal: bool = False

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        vq_embeddings: Optional[jnp.ndarray] = None,
        *,
        train: bool = False,
    ) -> jnp.ndarray:
        x = nn.Embed(self.num_tokens_in, self.dim, name="to_embed")(tokens)
        if self.vq_embedding_dim is not None:
            x = x + nn.Dense(self.dim, name="vq_embed_proj")(vq_embeddings)

        drop = train and self.prob_survival < 1.0
        if drop:
            keys = jax.random.split(
                self.make_rng("layer_drop"), self.depth
            )
        for i in range(self.depth):
            block = GMLPBlock(
                dim_ff=self.dim * self.ff_mult,
                seq_len=self.seq_len,
                attn_dim=self.attn_dim,
                causal=self.causal,
                name=f"block_{i}",
            )
            y = block(nn.LayerNorm(name=f"norm_{i}")(x))
            if drop:
                keep = jax.random.bernoulli(
                    keys[i], self.prob_survival
                ).astype(x.dtype)
                y = y * keep
            x = x + y
        x = nn.LayerNorm(name="final_norm")(x)
        return nn.Dense(self.num_tokens_out, name="to_logits")(x)
