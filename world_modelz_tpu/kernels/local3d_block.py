"""Whole-block fused local-3D attention: QKV projections + windowed
space-time attention + output projection in ONE Pallas program per clip.

Why: at the flagship model-#3 shape (S=6, 16x16 grid, inner 128, dim 384)
the attention *op* is launch/HBM-bound — Pallas attention alone gains only
~5% over XLA because the op's useful FLOPs are tiny (the 3x3 spatial window
masks away 28/29 of the dense score matrix). The remaining lever is HBM
traffic and launch count for the whole residual-attention block: today the
block runs 4 XLA matmuls + 1 attention kernel, writing/re-reading q, k, v
and the attention output through HBM (~60 MB of traffic at the m3 shape).
This kernel keeps every intermediate in VMEM: it reads the normed k/v
stream and the raw query stream once, computes k/v/q projections on the
MXU, runs the per-frame windowed attention in-register (same math as
`local3d.py`), applies the output projection, and writes only the block
output (~28 MB total traffic, one launch).

Reference mapping: this fuses `Local3dAttention.__call__`
(vq-video-diffusion/local_3d_attention.py:34-118) — to_q/to_k/to_v
projections (:46-48, to_q/to_k bias-free, to_v biased), the windowed
attention (:78-99), and the to_out projection (:52) — into one program.
The reference has no counterpart fusion (its Triton prototype was
attention-only and forward-only, triton_prototpye/...:186-189).

Autodiff: `local3d_block` carries a custom_vjp whose backward
rematerializes the block and differentiates the recomputation — through
the attention-only Pallas kernel (hand-written bwd) on TPU, through the
plain-XLA composition elsewhere (the same trade `torch.utils.checkpoint`
makes in the reference, local_3d_attention.py:110-113).

MEASURED VERDICT (v5e, 200-invocation chains, m3 shape b8 s6 16x16
dim384): whole-block fwd 0.135 ms vs 0.125 ms for the attention-only
kernel + XLA projections (XLA fuses the projection matmuls around the
kernel well enough that the extra VMEM residency buys nothing), and the
train step loses ~12% because this kernel's backward recomputes the
projections too. The attention-only composition stays the default
(`Local3dAttention` backend='auto'); this kernel is an explicit opt-in
(backend='fused') kept with full fwd+bwd parity tests as the
whole-block-fusion capability.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from world_modelz_tpu.kernels.local3d import (
    NEG_INF,
    _band_bounds,
    _band_candidates,
    _mask_band,
)

# the fused block holds two full input clips + projections + one banded
# query tile's f32 score block ((qt*W, Ts*band*W) — see fits_vmem_block);
# give it more headroom than the attention-only kernels but stay under the
# ~16 MiB/core VMEM with room for double buffering
_BLOCK_VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def fits_vmem_block(
    seq: int,
    height: int,
    width: int,
    extents: Tuple[int, int, int],
    heads: int,
    dh: int,
    dim: int,
    out_dim: int,
    itemsize: int = 2,
) -> bool:
    """Whether one fused-block program (a whole clip) fits the VMEM budget.

    Working set: x_kv + q_in clips, padded k/v + q projections, one
    BANDED query tile's f32 score block (+ its exp) — the kernel runs
    `_band_candidates` row bands, so the live score is
    (qt*W, Ts*(qt+2eh)*W), not the full (HW, Ts*HW) — the
    attention-output staging clip, the output clip, and the four weight
    matrices. Operands are sized at their dtype (`itemsize`); scores are
    always f32. The score term is sized at the narrowest band the kernel
    would select (the same `next(_band_candidates)` choice the caller
    makes), so the gate admits every shape the banded kernel can fit."""
    hw = height * width
    es, eh = extents[0], extents[1]
    ts = 2 * es + 1
    inner = heads * dh
    clips_in = 2 * seq * hw * dim * itemsize
    proj = (2 * (seq + 2 * es) + seq) * hw * inner * itemsize
    qt = next((c for c in _band_candidates(height, width, eh) if c < height),
              height)
    band = min(height, qt + 2 * eh)
    score = qt * width * ts * band * width * 4 * 2
    staging = seq * hw * inner * itemsize
    out = seq * hw * out_dim * itemsize
    weights = (3 * dim * inner + inner * out_dim) * itemsize
    total = clips_in + proj + score + staging + out + weights
    return total <= _BLOCK_VMEM_BUDGET_BYTES


def block_supported(
    seq: int,
    height: int,
    width: int,
    extents: Tuple[int, int, int],
    heads: int,
    dh: int,
    dim: int,
    out_dim: int,
    itemsize: int = 2,
) -> bool:
    """Gate for the fused path: clip working set must fit VMEM and the
    static frame x head unroll must stay reasonable (compile time)."""
    return seq * heads <= 64 and fits_vmem_block(
        seq, height, width, extents, heads, dh, dim, out_dim, itemsize
    )


def _block_kernel(
    x_ref,
    qin_ref,
    wk_ref,
    wv_ref,
    bv_ref,
    wq_ref,
    wo_ref,
    bo_ref,
    o_ref,
    *,
    seq: int,
    height: int,
    width: int,
    extents: Tuple[int, int, int],
    heads: int,
    dh: int,
    qt: Optional[int] = None,
):
    es = extents[0]
    hw = height * width
    ts = 2 * es + 1
    inner = heads * dh

    x = x_ref[0].reshape(seq * hw, -1)  # (S*HW, dim) normed k/v stream
    qin = qin_ref[0].reshape(seq * hw, -1)  # (S*HW, dim_q) raw query stream
    dt = x.dtype

    # projections: bf16 operands on the MXU, f32 accumulation, cast back
    def mm(a, w):
        return jnp.dot(a, w, preferred_element_type=jnp.float32).astype(dt)

    k = mm(x, wk_ref[...]).reshape(seq, hw, inner)
    v = (mm(x, wv_ref[...]) + bv_ref[0].astype(dt)).reshape(
        seq, hw, inner
    )
    q = mm(qin, wq_ref[...]).reshape(seq, hw, inner)

    # zero-pad the frame axis so offset ds of query frame f reads f + ds
    zpad = jnp.zeros((es, hw, inner), dt)
    k_pad = jnp.concatenate([zpad, k, zpad], axis=0)
    v_pad = jnp.concatenate([zpad, v, zpad], axis=0)

    scale = dh**-0.5
    eh = extents[1]
    qt = height if qt is None else qt
    rows = []
    for f in range(seq):  # static unroll: S*heads small by `block_supported`
        head_outs = []
        for h_i in range(heads):
            sl = slice(h_i * dh, (h_i + 1) * dh)
            tiles = []
            # banded query row tiles against their clamped +-eh key row
            # band, exactly as the attention-only kernels (the executed
            # masked-dense flop cut measured there carries over)
            for h0 in range(0, height, qt):
                lo, hi = _band_bounds(height, eh, h0, qt)
                qf = q[f, h0 * width : (h0 + qt) * width, sl]  # (qt*W, dh)
                kf = k_pad[f : f + ts, lo * width : hi * width, sl].reshape(
                    ts * (hi - lo) * width, dh
                )
                vf = v_pad[f : f + ts, lo * width : hi * width, sl].reshape(
                    ts * (hi - lo) * width, dh
                )
                scores = (
                    jnp.dot(qf, kf.T, preferred_element_type=jnp.float32)
                    * scale
                )
                ok = _mask_band(
                    seq, height, width, extents, f, h0, qt, lo, hi
                )
                scores = jnp.where(ok, scores, NEG_INF)
                m = jnp.max(scores, axis=-1, keepdims=True)
                p = jnp.exp(scores - m)
                attn = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(dt)
                tiles.append(
                    jnp.dot(
                        attn, vf, preferred_element_type=jnp.float32
                    ).astype(dt)
                )
            head_outs.append(
                tiles[0] if len(tiles) == 1 else jnp.concatenate(tiles, axis=0)
            )
        rows.append(
            head_outs[0]
            if len(head_outs) == 1
            else jnp.concatenate(head_outs, axis=-1)
        )  # (HW, inner)

    attn_out = jnp.stack(rows, axis=0).reshape(seq * hw, inner)
    out = (
        jnp.dot(attn_out, wo_ref[...], preferred_element_type=jnp.float32)
        + bo_ref[0].astype(jnp.float32)
    ).astype(o_ref.dtype)
    o_ref[0] = out.reshape(seq, hw, -1)


def _block_fwd_impl(
    x_kv, q_in, wk, wv, bv, wq, wo, bo, extents, heads, interpret
):
    b, s, h, w, dim = x_kv.shape
    inner = wk.shape[1]
    dh = inner // heads
    out_dim = wo.shape[1]
    hw = h * w
    es = extents[0]
    ts = 2 * es + 1

    xz = x_kv.reshape(b, s, hw, dim)
    qz = q_in.reshape(b, s, hw, q_in.shape[-1])
    bv2 = bv.reshape(1, -1)
    bo2 = bo.reshape(1, -1)

    clip_spec = lambda d: pl.BlockSpec(
        (1, s, hw, d), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )

    def w_spec(shape):
        return pl.BlockSpec(
            shape, lambda i: tuple(0 for _ in shape),
            memory_space=pltpu.VMEM,
        )

    # band the attention section like the attention-only kernels: the
    # narrowest query row tile whose M dim still fills the MXU sublane
    # tile (qt*W >= 128, _band_candidates), unbanded when no tile saves
    # flops (e.g. 8x8 grids — measured worse there in band_ab)
    qt = next(
        (c for c in _band_candidates(h, w, extents[1]) if c < h), None
    )
    kernel = functools.partial(
        _block_kernel, seq=s, height=h, width=w, extents=extents,
        heads=heads, dh=dh, qt=qt,
    )
    # useful-FLOPs estimate: projections (dense) + attention over the
    # (2e_h+1)(2e_w+1) valid spatial window
    eh, ew = extents[1], extents[2]
    win = (2 * eh + 1) * (2 * ew + 1)
    proj_flops = 2 * b * s * hw * dim * inner * 3 + 2 * b * s * hw * inner * out_dim
    attn_flops = 4 * b * s * hw * ts * win * dh * heads
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            clip_spec(dim),
            clip_spec(q_in.shape[-1]),
            w_spec(wk.shape),
            w_spec(wv.shape),
            w_spec(bv2.shape),
            w_spec(wq.shape),
            w_spec(wo.shape),
            w_spec(bo2.shape),
        ],
        out_specs=clip_spec(out_dim),
        out_shape=jax.ShapeDtypeStruct((b, s, hw, out_dim), x_kv.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=proj_flops + attn_flops,
            bytes_accessed=(
                x_kv.size + q_in.size + b * s * hw * out_dim
            ) * x_kv.dtype.itemsize,
            transcendentals=b * heads * s * hw * ts * hw,
        ),
    )(xz, qz, wk, wv, bv2, wq, wo, bo2)
    return out.reshape(b, s, h, w, out_dim)


def _block_reference(x_kv, q_in, wk, wv, bv, wq, wo, bo, extents, heads):
    """Plain-XLA composition of the same block — golden path and the
    rematerialized backward. Matches nn.Dense dtype promotion."""
    from world_modelz_tpu.models.attention import (
        _dense_apply as mm, local3d_attention,
    )

    k = mm(x_kv, wk)
    v = mm(x_kv, wv, bv)
    q = mm(q_in, wq)
    out = local3d_attention(q, k, v, extents, heads)
    return mm(out, wo, bo)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def local3d_block(x_kv, q_in, wk, wv, bv, wq, wo, bo, extents, heads,
                  interpret=False):
    """Fused attention block: out = (attn(q_in@wq, x_kv@wk, x_kv@wv+bv))
    @wo + bo, one Pallas program per clip. Shapes: x_kv/q_in
    (B, S, H, W, dim), out (B, S, H, W, wo.shape[1])."""
    return _block_fwd_impl(
        x_kv, q_in, wk, wv, bv, wq, wo, bo, extents, heads, interpret
    )


def _block_vjp_fwd(x_kv, q_in, wk, wv, bv, wq, wo, bo, extents, heads,
                   interpret):
    out = _block_fwd_impl(
        x_kv, q_in, wk, wv, bv, wq, wo, bo, extents, heads, interpret
    )
    return out, (x_kv, q_in, wk, wv, bv, wq, wo, bo)


def _block_pallas_composition(
    x_kv, q_in, wk, wv, bv, wq, wo, bo, extents, heads
):
    """Projections in XLA + the attention-only Pallas kernel (which carries
    its own hand-written backward). Same math as `_block_reference`; used to
    rematerialize the fused block's backward on TPU so the gradient rides
    the fast attention kernel instead of the unfold-style XLA lowering."""
    from world_modelz_tpu.kernels.local3d import local3d_attention_pallas
    from world_modelz_tpu.models.attention import _dense_apply as mm

    k = mm(x_kv, wk)
    v = mm(x_kv, wv, bv)
    q = mm(q_in, wq)
    out = local3d_attention_pallas(q, k, v, extents, heads)
    return mm(out, wo, bo)


def _block_vjp_bwd(extents, heads, interpret, residuals, g):
    x_kv, q_in, wk, wv, bv, wq, wo, bo = residuals
    from world_modelz_tpu.kernels.local3d import kernel_supported

    s, h, w = x_kv.shape[1:4]
    dh = wk.shape[1] // heads
    use_pallas = (
        not interpret
        and jax.default_backend() == "tpu"
        and kernel_supported(s, h, w, extents, dh)
    )
    comp = _block_pallas_composition if use_pallas else _block_reference
    _, vjp = jax.vjp(
        lambda *ops: comp(*ops, extents, heads),
        x_kv, q_in, wk, wv, bv, wq, wo, bo,
    )
    return vjp(g.astype(x_kv.dtype))


local3d_block.defvjp(_block_vjp_fwd, _block_vjp_bwd)
