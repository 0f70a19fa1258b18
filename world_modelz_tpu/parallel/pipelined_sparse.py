"""Pipeline-parallel forward for the sparse space-time denoiser.

Makes `parallel.pipeline.pipeline_apply` a usable trainer feature (not just
a library demo): the `VqSparseDiffusionModel`'s homogeneous DenseTransformer
stack (models/video.py:69-123) is split into `n_stages` contiguous layer
groups whose parameters shard over a ``'pipe'`` mesh axis, while the
embedding gathers and logit head (tiny) run replicated outside the pipeline.

The per-layer math here is a pure-function re-statement of
`DenseTransformer`'s flax modules operating directly on the SAME parameter
tree — no re-initialization, no weight conversion; a checkpoint trained
with the plain model runs pipelined and vice versa. Golden parity
(values + gradients) is asserted in tests/test_pipeline.py.

Deterministic path only (dropout must be 0 — the sparse trainer's default);
`train=True` with dropout raises.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp

from world_modelz_tpu.parallel.pipeline import (
    microbatch,
    pipeline_apply,
    stack_stage_params,
    unmicrobatch,
)


def _layer_norm(p: Any, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """flax nn.LayerNorm with scale+bias (default epsilon)."""
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
    y = (x - mean) * jax.lax.rsqrt(var + eps)
    return y * p["scale"] + p["bias"]


def dense_layer_apply(
    p: Any, x: jnp.ndarray, heads: int, dim_head: int
) -> jnp.ndarray:
    """One pre-norm block: x + Attn(LN(x)); x + FF(LN(x)).

    `p` holds the flax subtrees {ln1, attn, ln2, ff} of one DenseTransformer
    depth step (models/attention.py:112-128)."""
    h = _layer_norm(p["ln1"], x)
    qkv = h @ p["attn"]["to_qkv"]["kernel"]  # (B, N, 3*inner), no bias
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split_heads(t):
        b, n, _ = t.shape
        return t.reshape(b, n, heads, dim_head).transpose(0, 2, 1, 3)

    q, k, v = map(split_heads, (q, k, v))
    scale = dim_head**-0.5
    scores = (
        jnp.einsum(
            "bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32
        )
        * scale
    )
    attn = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v)
    b, nh, n, d = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(b, n, nh * d)
    if "to_out" in p["attn"]:
        out = out @ p["attn"]["to_out"]["kernel"] + p["attn"]["to_out"]["bias"]
    x = x + out

    h = _layer_norm(p["ln2"], x)
    h = h @ p["ff"]["Dense_0"]["kernel"] + p["ff"]["Dense_0"]["bias"]
    h = jax.nn.gelu(h)
    h = h @ p["ff"]["Dense_1"]["kernel"] + p["ff"]["Dense_1"]["bias"]
    return x + h


def stack_transformer_layers(params: Any, depth: int, n_stages: int) -> Any:
    """Group the flax DenseTransformer subtree into per-stage stacked params.

    Returns a pytree with leading axes (n_stages, layers_per_stage, ...)
    ready for `pipeline_apply` whose block scans its stage's layer axis."""
    if depth % n_stages:
        raise ValueError(f"depth {depth} not divisible by {n_stages} stages")
    tp = params["transformer"]

    def layer(i):
        return {
            "ln1": tp[f"LayerNorm_{2 * i}"],
            "attn": tp[f"DenseAttention_{i}"],
            "ln2": tp[f"LayerNorm_{2 * i + 1}"],
            "ff": tp[f"FeedForward_{i}"],
        }

    per = depth // n_stages
    stages = [
        stack_stage_params([layer(s * per + j) for j in range(per)])
        for s in range(n_stages)
    ]
    return stack_stage_params(stages)


def sparse_forward_pipelined(
    model: Any,
    params: Any,
    tokens: jnp.ndarray,
    indices: jnp.ndarray,
    mesh,
    *,
    n_micro: int,
    axis: str = "pipe",
    data_axis: str = None,
    train: bool = False,
) -> jnp.ndarray:
    """Pipelined equivalent of `VqSparseDiffusionModel.apply`.

    Embedding gathers and the logit head run outside the pipeline (they are
    O(dim) per token); the depth-stack streams over `mesh[axis]`.
    """
    if train and model.dropout:
        raise NotImplementedError(
            "pipelined path is deterministic; set dropout=0"
        )
    _, h, w = model.shape
    w_pos = indices % w
    h_pos = (indices // w) % h
    s_pos = indices // (h * w)
    emb = params["embedding"]["embedding"]
    x = (
        jnp.take(emb, tokens, axis=0)
        + jnp.take(params["pos_emb_s"]["embedding"], s_pos, axis=0)
        + jnp.take(params["pos_emb_h"]["embedding"], h_pos, axis=0)
        + jnp.take(params["pos_emb_w"]["embedding"], w_pos, axis=0)
    )

    stacked = stack_transformer_layers(
        params, model.depth, mesh.shape[axis]
    )

    def stage_fn(stage_params, xb):
        def body(xb, lp):
            return (
                dense_layer_apply(lp, xb, model.heads, model.dim_head),
                None,
            )

        out, _ = jax.lax.scan(body, xb, stage_params)
        return out

    y = pipeline_apply(
        stage_fn,
        stacked,
        microbatch(x, n_micro),
        mesh,
        axis=axis,
        data_axis=data_axis,
    )
    y = unmicrobatch(y)
    return (
        y @ params["logit_proj"]["kernel"] + params["logit_proj"]["bias"]
    )
