"""Transformer backbones: dense ViT-style and NÜWA-style local 3D attention.

Capability parity with the reference sequence models:

- Dense pre-norm transformer (minecraft/transformer.py:34-80): fused QKV,
  per-head scaled dot-product, GELU MLP.
- `Local3dAttention` / `Local3dAttentionTransformer`
  (vq-video-diffusion/local_3d_attention.py:34-163): every (s, h, w) token of
  a video token grid attends to a (2e_s+1)(2e_h+1)(2e_w+1) space-time
  neighborhood, with border masking and factorized learned s/h/w position
  embeddings.

TPU-first redesign of the local attention: the reference materializes the
full unfolded key/value tensors — a (2e+1)^3-fold memory blowup
(local_3d_attention.py:57-69, 82-83) that needs gradient checkpointing to
survive. Here the neighborhood is expressed as *temporal shift stacking +
dense per-frame attention under a spatial window mask*:

  - keys/values are stacked for the 2e_s+1 frame offsets (a cheap roll, only
    (2e_s+1)x memory, no spatial duplication);
  - each query frame attends densely to those stacked frames — one big
    MXU-friendly batched matmul — while a precomputed boolean mask removes
    pairs outside the (2e_h+1)x(2e_w+1) spatial window and beyond the
    sequence borders.

This keeps all FLOPs in large matmuls (MXU), reduces peak memory ~(2e_h+1)
(2e_w+1)/1 relative to unfold, and needs no data-dependent shapes. The
fused Pallas kernel in `world_modelz_tpu.kernels.local3d` computes the same
math without materializing the score tensor in HBM; this module is its
golden reference. `jax.checkpoint` wraps the attention inner block exactly
where the reference checkpoints (local_3d_attention.py:110-113).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

NEG_INF = -1e9  # reference mask value (local_3d_attention.py:92)


class FeedForward(nn.Module):
    """Linear -> GELU -> Linear (transformer.py:20-31)."""

    hidden_dim: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        dim = x.shape[-1]
        x = nn.Dense(self.hidden_dim)(x)
        x = nn.gelu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(dim)(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


class MoEFeedForward(nn.Module):
    """Top-1 routed mixture-of-experts FFN — a drop-in for `FeedForward`.

    Wraps the pure dispatch/combine math of `parallel/moe.py` (capacity-slot
    einsums that lower to all-to-alls when the expert axis is sharded) in a
    linen module so transformers can enable expert parallelism with a config
    field. The load-balance auxiliary loss is sown into the ``"losses"``
    collection (key ``moe_aux``); trainers apply with
    ``mutable=["losses"]`` and add it to the objective — eval-time applies
    without the collection silently skip the sow.

    No reference counterpart (the reference has no MoE — SURVEY.md §2.2);
    this makes the parallelism capability a real model feature.
    """

    hidden_dim: int
    num_experts: int
    capacity_factor: float = 1.25
    impl: str = "dispatch"  # "reference": per-token golden path (tests)

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        from world_modelz_tpu.parallel.moe import (
            MoEParams,
            moe_ffn,
            moe_reference,
        )

        dim = x.shape[-1]
        e, hid = self.num_experts, self.hidden_dim
        p = MoEParams(
            w_gate=self.param(
                "w_gate", nn.initializers.normal(dim**-0.5), (dim, e)
            ),
            w_in=self.param(
                "w_in", nn.initializers.normal(dim**-0.5), (e, dim, hid)
            ),
            b_in=self.param("b_in", nn.initializers.zeros, (e, hid)),
            w_out=self.param(
                "w_out", nn.initializers.normal(hid**-0.5), (e, hid, dim)
            ),
            b_out=self.param("b_out", nn.initializers.zeros, (e, dim)),
        )
        p = jax.tree_util.tree_map(lambda w: w.astype(x.dtype), p)
        n = x.shape[1]
        capacity = max(1, int(np.ceil(self.capacity_factor * n / e)))
        if self.impl == "reference":
            y = moe_reference(p, x)
            gate = jax.nn.softmax(
                (x @ p.w_gate).astype(jnp.float32), axis=-1
            )
            sel = jax.nn.one_hot(jnp.argmax(gate, -1), e, dtype=gate.dtype)
            aux = jnp.sum(
                jnp.mean(sel, (0, 1)) * jnp.mean(gate, (0, 1))
            ) * e
        else:
            y, aux = moe_ffn(p, x, capacity=capacity)
        self.sow("losses", "moe_aux", aux)
        return y


def _flash_dense_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, scale: float
) -> jnp.ndarray:
    """Stock TPU flash-attention (pallas ops) over (B, H, N, D) operands.

    Streams K/V through VMEM with an online softmax, so the (N, N) score
    matrix never hits HBM — the memory-bound regime the dense sparse-
    diffusion transformer enters at long token subsets (sparse_diffusion.py
    contexts of 1-4k tokens). Pads N up to a block multiple; padded rows
    are fenced off with segment ids and sliced away."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    b, h, n, d = q.shape
    npad = -n % 128
    np_ = n + npad
    segment_ids = None
    if npad:
        pad = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, npad), (0, 0)))
        q, k, v = pad(q), pad(k), pad(v)
        seg = jnp.concatenate(
            [jnp.zeros((b, n), jnp.int32), jnp.ones((b, npad), jnp.int32)],
            axis=1,
        )
        segment_ids = SegmentIds(q=seg, kv=seg)
    blk = max(bq for bq in (512, 256, 128) if np_ % bq == 0)
    bs = BlockSizes(
        block_q=blk, block_k_major=blk, block_k=blk, block_b=1,
        block_q_major_dkv=blk, block_k_major_dkv=blk, block_k_dkv=blk,
        block_q_dkv=blk, block_k_major_dq=blk, block_k_dq=blk,
        block_q_dq=blk,
    )
    out = flash_attention(
        q, k, v, segment_ids=segment_ids, causal=False, sm_scale=scale,
        block_sizes=bs,
    )
    return out[:, :, :n] if npad else out


class DenseAttention(nn.Module):
    """Fused-QKV multi-head self-attention (transformer.py:34-64).

    ``backend``: "xla" is the einsum reference; "flash" runs the stock TPU
    flash-attention kernel (TPU only, incompatible with attention-weight
    dropout); "auto" picks flash on TPU for long sequences (N >= 1024,
    where the score matrix stops fitting cache) when dropout is off."""

    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    backend: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        dim = x.shape[-1]
        inner = self.heads * self.dim_head
        project_out = not (self.heads == 1 and self.dim_head == dim)

        qkv = nn.Dense(inner * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(t):
            b, n, _ = t.shape
            return t.reshape(b, n, self.heads, self.dim_head).transpose(
                0, 2, 1, 3
            )

        q, k, v = map(split_heads, (q, k, v))
        scale = self.dim_head**-0.5

        n_tok = q.shape[2]
        on_tpu = jax.default_backend() == "tpu"
        backend = self.backend
        if backend == "auto":
            backend = (
                "flash"
                if on_tpu and self.dropout == 0.0 and n_tok >= 1024
                else "xla"
            )
        if backend == "flash":
            if not on_tpu:
                raise ValueError(
                    "backend='flash' needs a TPU (use 'xla' or 'auto')"
                )
            if self.dropout > 0.0:
                raise ValueError(
                    "backend='flash' cannot apply attention-weight dropout"
                )
            out = _flash_dense_attention(q, k, v, scale)
        else:
            scores = (
                jnp.einsum(
                    "bhnd,bhmd->bhnm", q, k,
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            attn = jax.nn.softmax(scores, axis=-1)
            attn = nn.Dropout(self.dropout, deterministic=not train)(attn)
            out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v)
        b, h, n, d = out.shape
        out = out.transpose(0, 2, 1, 3).reshape(b, n, h * d)
        if project_out:
            out = nn.Dense(dim, name="to_out")(out)
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class DenseTransformer(nn.Module):
    """Pre-norm residual transformer stack (transformer.py:67-80).

    ``moe_experts > 0`` swaps every FFN for a `MoEFeedForward` (expert
    parallelism; the reference has none — new TPU-native capability).
    """

    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    attn_backend: str = "auto"  # auto | flash | xla (DenseAttention)
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25
    moe_impl: str = "dispatch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        for _ in range(self.depth):
            x = (
                DenseAttention(
                    heads=self.heads,
                    dim_head=self.dim_head,
                    dropout=self.dropout,
                    backend=self.attn_backend,
                )(nn.LayerNorm()(x), train=train)
                + x
            )
            if self.moe_experts > 0:
                ff = MoEFeedForward(
                    hidden_dim=self.mlp_dim,
                    num_experts=self.moe_experts,
                    capacity_factor=self.moe_capacity_factor,
                    impl=self.moe_impl,
                )
            else:
                ff = FeedForward(self.mlp_dim, dropout=self.dropout)
            x = ff(nn.LayerNorm()(x), train=train) + x
        return x


# ---------------------------------------------------------------------------
# Local 3D attention
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _spatial_window_mask(
    height: int, width: int, eh: int, ew: int
) -> np.ndarray:
    """(HW, HW) bool: True where key (h', w') is OUTSIDE the query's
    (2eh+1)x(2ew+1) window — positions the reference's unfold would simply
    not include (local_3d_attention.py:65-69)."""
    hq = np.arange(height)[:, None, None, None]
    wq = np.arange(width)[None, :, None, None]
    hk = np.arange(height)[None, None, :, None]
    wk = np.arange(width)[None, None, None, :]
    inside = (np.abs(hq - hk) <= eh) & (np.abs(wq - wk) <= ew)
    return (~inside).reshape(height * width, height * width)


@functools.lru_cache(maxsize=16)
def _temporal_validity_mask(seq: int, es: int) -> np.ndarray:
    """(S, 2es+1) bool: True where frame offset ds falls off the clip —
    the reference's border padding mask (local_3d_attention.py:71-76)."""
    s = np.arange(seq)[:, None]
    ds = np.arange(-es, es + 1)[None, :]
    return ~((s + ds >= 0) & (s + ds < seq))


def local3d_attention_weights_mask(
    seq: int, height: int, width: int, extents: Tuple[int, int, int]
) -> jnp.ndarray:
    """(S, HW, Ts, HW) additive mask (0 or NEG_INF)."""
    es, eh, ew = extents
    spatial = _spatial_window_mask(height, width, eh, ew)  # (HW, HW)
    temporal = _temporal_validity_mask(seq, es)  # (S, Ts)
    masked = spatial[None, :, None, :] | temporal[:, None, :, None]
    return jnp.where(jnp.asarray(masked), NEG_INF, 0.0).astype(jnp.float32)


def _shift_stack_frames(t: jnp.ndarray, es: int) -> jnp.ndarray:
    """(B, S, HW, D) -> (B, S, Ts, HW, D) where out[:, s, i] = t[:, s+ds_i]
    (zero-padded off the ends; those positions are masked)."""
    stacks = []
    zeros = jnp.zeros_like(t[:, :1])
    seq = t.shape[1]
    for ds in range(-es, es + 1):
        if ds < 0:
            pad = jnp.broadcast_to(zeros, t[:, : -ds].shape)
            shifted = jnp.concatenate([pad, t[:, :ds]], axis=1)
        elif ds > 0:
            pad = jnp.broadcast_to(zeros, t[:, :ds].shape)
            shifted = jnp.concatenate([t[:, ds:], pad], axis=1)
        else:
            shifted = t
        stacks.append(shifted)
    return jnp.stack(stacks, axis=2)


def local3d_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    extents: Tuple[int, int, int],
    heads: int,
) -> jnp.ndarray:
    """Windowed space-time attention core.

    Args:
      q, k, v: (B, S, H, W, heads * dim_head).
      extents: (e_s, e_h, e_w) neighborhood half-widths.
      heads: number of attention heads.

    Returns:
      (B, S, H, W, heads * dim_head) attention output. Matches the
      reference's unfold-based `local_attention`
      (local_3d_attention.py:78-99) numerically (same softmax over the same
      key set with -1e9 border masking).
    """
    es, eh, ew = extents
    b, s, h, w, inner = q.shape
    dh = inner // heads
    hw = h * w
    ts = 2 * es + 1

    def to_heads(t):
        return t.reshape(b, s, hw, heads, dh).transpose(0, 3, 1, 2, 4)

    qh = to_heads(q)  # (B, hd, S, HW, dh)
    kh = to_heads(k)
    vh = to_heads(v)

    kh = _shift_stack_frames(
        kh.reshape(b * heads, s, hw, dh), es
    )  # (B*hd, S, Ts, HW, dh)
    vh = _shift_stack_frames(vh.reshape(b * heads, s, hw, dh), es)
    qh = qh.reshape(b * heads, s, hw, dh)

    scale = dh**-0.5
    scores = (
        jnp.einsum(
            "zsqd,zstkd->zsqtk", qh, kh, preferred_element_type=jnp.float32
        )
        * scale
    )  # (B*hd, S, HW, Ts, HW)
    mask = local3d_attention_weights_mask(s, h, w, extents)  # (S, HW, Ts, HW)
    scores = scores + mask[None]

    attn = jax.nn.softmax(
        scores.reshape(b * heads, s, hw, ts * hw), axis=-1
    ).reshape(scores.shape)
    out = jnp.einsum(
        "zsqtk,zstkd->zsqd", attn.astype(vh.dtype), vh
    )  # (B*hd, S, HW, dh)
    out = (
        out.reshape(b, heads, s, hw, dh)
        .transpose(0, 2, 3, 1, 4)
        .reshape(b, s, h, w, inner)
    )
    return out


class _DenseParams(nn.Module):
    """Declares exactly nn.Dense's parameter tree ({kernel[, bias]}, same
    shapes, same initializers) but returns the raw arrays instead of
    applying them — so the fused whole-block Pallas kernel
    (`kernels.local3d_block`) can consume the weights directly while
    checkpoints stay interchangeable with the nn.Dense layout."""

    features: int
    use_bias: bool

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_features, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )
        return kernel, bias


def _dense_apply(t: jnp.ndarray, kernel, bias=None) -> jnp.ndarray:
    """nn.Dense's compute contract: promote input and params to a common
    dtype, matmul, add bias."""
    dt = jnp.promote_types(t.dtype, kernel.dtype)
    y = t.astype(dt) @ kernel.astype(dt)
    if bias is not None:
        y = y + bias.astype(dt)
    return y


class Local3dAttention(nn.Module):
    """QKV projections around the windowed attention core
    (local_3d_attention.py:34-118). `use_checkpointing` rematerializes the
    attention inner block in the backward pass, mirroring
    local_3d_attention.py:110-113."""

    extents: Tuple[int, int, int]
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    use_checkpointing: bool = True
    # "auto" = attention-only Pallas kernel on TPU (measured best for both
    # fwd and train at the flagship shapes), XLA elsewhere; or force
    # "fused" (whole-block kernel, forward ~parity / train ~12% slower —
    # opt-in) / "pallas" / "xla"
    backend: str = "auto"
    # sequence parallelism: shard the frame axis over `seq_mesh[seq_axis]`
    # via halo-exchange attention (parallel/sequence.py). Overrides backend.
    seq_axis: str = ""
    seq_mesh: object = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, q: jnp.ndarray, *, train: bool = False
    ) -> jnp.ndarray:
        dim = x.shape[-1]
        inner = self.heads * self.dim_head
        project_out = not (self.heads == 1 and self.dim_head == dim)

        # bias pattern matches the reference (to_q/to_k bias-free, to_v
        # biased; local_3d_attention.py:46-48); raw weights so the fused
        # block kernel can consume them — same param tree as nn.Dense
        wk, _ = _DenseParams(inner, use_bias=False, name="to_k")(dim)
        wv, bv = _DenseParams(inner, use_bias=True, name="to_v")(dim)
        wq, _ = _DenseParams(inner, use_bias=False, name="to_q")(
            q.shape[-1]
        )
        wo, bo = (None, None)
        if project_out:
            wo, bo = _DenseParams(dim, use_bias=True, name="to_out")(inner)

        if self.seq_axis:
            if self.seq_mesh is None:
                raise ValueError(
                    "seq_axis set but no seq_mesh given; pass the device "
                    "mesh carrying the sequence axis"
                )
            from world_modelz_tpu.parallel.sequence import (
                seq_sharded_attention,
            )

            attend = functools.partial(
                seq_sharded_attention,
                extents=self.extents,
                heads=self.heads,
                mesh=self.seq_mesh,
                axis_name=self.seq_axis,
            )
            if self.use_checkpointing:
                attend = jax.checkpoint(attend)
            out = attend(_dense_apply(q, wq), _dense_apply(x, wk),
                         _dense_apply(x, wv, bv))
            if project_out:
                out = _dense_apply(out, wo, bo)
                out = nn.Dropout(self.dropout, deterministic=not train)(out)
            return out

        s_, h_, w_ = x.shape[1:4]
        on_tpu = jax.default_backend() == "tpu"
        dt = jnp.promote_types(x.dtype, wk.dtype)

        def fused_ok():
            from world_modelz_tpu.kernels.local3d_block import (
                block_supported,
            )

            return project_out and block_supported(
                s_, h_, w_, self.extents, self.heads, self.dim_head,
                dim, dim, jnp.dtype(dt).itemsize,
            )

        backend = self.backend
        if backend == "auto":
            # measured on v5e at the m3 shape (200-invocation chains):
            # whole-block fwd pallas 0.125 ms ~= fused 0.135 ms, and the
            # fused train step loses ~12% (the custom_vjp rematerializes
            # the projections too). The attention-only kernel composition
            # is the best default; 'fused' stays an explicit opt-in for
            # forward-only serving experiments.
            backend = "pallas" if on_tpu else "xla"
        if backend == "fused" and self.is_initializing():
            # init traces in f32 (params are created f32), where the fused
            # kernel's VMEM fit check can reject shapes the bf16 apply
            # accepts. The param tree is backend-independent, so trace the
            # XLA path for shape inference and keep 'fused' for apply.
            backend = "xla"
        if backend == "fused" and not fused_ok():
            raise ValueError(
                "fused local3d block kernel unsupported for grid "
                f"{h_}x{w_} S={s_} extents {self.extents} dtype {dt} "
                "(working set exceeds VMEM or no output projection); "
                "use backend='pallas' or 'xla'"
            )
        if backend == "fused":
            from world_modelz_tpu.kernels.local3d_block import local3d_block

            # whole block in one Pallas program per clip: QKV projections,
            # windowed attention, and the output projection never touch HBM
            out = local3d_block(
                x.astype(dt), q.astype(dt), wk.astype(dt), wv.astype(dt),
                bv.astype(dt), wq.astype(dt), wo.astype(dt), bo.astype(dt),
                self.extents, self.heads, not on_tpu,
            )
            return nn.Dropout(self.dropout, deterministic=not train)(out)

        k = _dense_apply(x, wk)
        v = _dense_apply(x, wv, bv)
        qp = _dense_apply(q, wq)

        if backend == "pallas":
            from world_modelz_tpu.kernels.local3d import kernel_supported

            if not kernel_supported(s_, h_, w_, self.extents, self.dim_head):
                if self.backend == "pallas":
                    raise ValueError(
                        "local3d pallas kernel working set exceeds VMEM for "
                        f"grid {h_}x{w_} extents {self.extents} (no valid "
                        "H-tile); use backend='xla'"
                    )
                backend = "xla"  # auto: fallback
        if backend == "pallas":
            from world_modelz_tpu.kernels.local3d import (
                local3d_attention_pallas,
            )

            # custom_vjp already rematerializes in bwd — no extra checkpoint
            out = local3d_attention_pallas(
                qp, k, v, self.extents, self.heads, not on_tpu,
            )
        else:
            attend = functools.partial(
                local3d_attention, extents=self.extents, heads=self.heads
            )
            if self.use_checkpointing:
                attend = jax.checkpoint(attend)
            out = attend(qp, k, v)

        if project_out:
            out = _dense_apply(out, wo, bo)
            out = nn.Dropout(self.dropout, deterministic=not train)(out)
        return out


class Local3dAttentionTransformer(nn.Module):
    """Token embedding + factorized 3D position embedding + pre-norm stack of
    local-attention / MLP residual blocks (local_3d_attention.py:121-163).

    Input: (B, S, H, W) int tokens; output (B, S, H, W, dim) features.
    """

    data_shape: Tuple[int, int, int]  # (S, H, W) maxima for position tables
    dim: int
    num_classes: int
    extents: Tuple[int, int, int]
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    dropout: float = 0.0
    use_checkpointing: bool = True
    backend: str = "auto"
    seq_axis: str = ""
    seq_mesh: object = None

    def get_pos_embedding(
        self, s: int, h: int, w: int
    ) -> jnp.ndarray:
        """Sum of learned s/h/w embeddings (local_3d_attention.py:140-151)."""
        s_emb = self.pos_emb_s(jnp.arange(s))  # (S, dim)
        h_emb = self.pos_emb_h(jnp.arange(h))
        w_emb = self.pos_emb_w(jnp.arange(w))
        return (
            s_emb[:, None, None, :]
            + h_emb[None, :, None, :]
            + w_emb[None, None, :, :]
        )  # (S, H, W, dim)

    def setup(self):
        self.embedding = nn.Embed(self.num_classes, self.dim)
        self.pos_emb_s = nn.Embed(self.data_shape[0], self.dim)
        self.pos_emb_h = nn.Embed(self.data_shape[1], self.dim)
        self.pos_emb_w = nn.Embed(self.data_shape[2], self.dim)
        self.attn_norms = [
            nn.LayerNorm(name=f"attn_norm_{i}") for i in range(self.depth)
        ]
        self.attns = [
            Local3dAttention(
                extents=self.extents,
                heads=self.heads,
                dim_head=self.dim_head,
                dropout=self.dropout,
                use_checkpointing=self.use_checkpointing,
                backend=self.backend,
                seq_axis=self.seq_axis,
                seq_mesh=self.seq_mesh,
                name=f"attn_{i}",
            )
            for i in range(self.depth)
        ]
        self.ff_norms = [
            nn.LayerNorm(name=f"ff_norm_{i}") for i in range(self.depth)
        ]
        self.ffs = [
            FeedForward(self.mlp_dim, dropout=self.dropout, name=f"ff_{i}")
            for i in range(self.depth)
        ]

    def __call__(self, tokens: jnp.ndarray, *, train: bool = False) -> jnp.ndarray:
        b, s, h, w = tokens.shape
        x = self.embedding(tokens)
        x = x + self.get_pos_embedding(s, h, w)[None]
        for norm_a, attn, norm_f, ff in zip(
            self.attn_norms, self.attns, self.ff_norms, self.ffs
        ):
            # reference quirk preserved: PreNorm norms only the k/v input;
            # the query rides through un-normed (local_3d_attention.py:16-17
            # applied at :160 — `attn(x, q=x)` norms the positional arg only)
            x = attn(norm_a(x), x, train=train) + x
            x = ff(norm_f(x), train=train) + x
        return x
