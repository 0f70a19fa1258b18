"""Multi-latent EMA vector quantizer as a pure function.

Capability parity with the reference `VectorQuantizerEMA` (vq/vq.py:5-110) and
the single-codebook `VectorQuantizerEMA1` (vq-video-diffusion/vq.py:114-174),
re-designed TPU-first:

- All buffers (codebook, EMA cluster sizes, activation/error stats) live in an
  explicit :class:`VQState` pytree; :func:`vq_apply` is ``(state, x) ->
  (VQOutput, new_state)``. This makes the EMA update jit-able and — because
  every statistic is a *sum over the batch* — automatically correct under
  pjit data parallelism: with the batch sharded over a mesh axis, XLA turns
  the global-view reductions into psums over ICI (no hand-written collectives).
- Distances use the ``|x|^2 + |e|^2 - 2 x.e`` matmul form so the O(N*K*D) work
  lands on the MXU instead of the VPU broadcast the reference used
  (vq/vq.py:29 materializes an (N, L, D, K) tensor; we never do).
- Dead-code revival (`reuse_inactive`, vq/vq.py:95-106) uses data-dependent
  shapes in the reference (topk of a dynamic count); here it is reformulated
  as a fixed-shape masked blend so it can run inside jit.

A fused Pallas kernel for the encode path lives in
``world_modelz_tpu.kernels.vq_kernels``; this module is the XLA reference
implementation used for its golden tests.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class VQState:
    """State of a multi-latent EMA vector quantizer.

    Attributes:
      codebook: (num_latents, num_embeddings, embedding_dim) code vectors.
      cluster_size: (num_latents, num_embeddings) EMA of per-code assignment
        counts (reference: `cluster_size`, vq/vq.py:16).
      activation_count: (num_latents, num_embeddings) assignments since the
        last `reset_stats` (reference: vq/vq.py:18).
      accumulated_error: (num_latents, num_embeddings) summed squared
        quantization error per code since the last reset (vq/vq.py:19).
    """

    codebook: jnp.ndarray
    cluster_size: jnp.ndarray
    activation_count: jnp.ndarray
    accumulated_error: jnp.ndarray

    @property
    def num_latents(self) -> int:
        return self.codebook.shape[0]

    @property
    def num_embeddings(self) -> int:
        return self.codebook.shape[1]

    @property
    def embedding_dim(self) -> int:
        return self.codebook.shape[2]


@struct.dataclass
class VQOutput:
    """Result of a quantization forward pass.

    Attributes:
      quantized: same shape as the input; straight-through estimator applied.
      indices: (N, num_latents) int32 codebook indices of the flattened input.
      commitment_loss: scalar mean squared error between input and its
        (stopped-gradient) quantization (vq/vq.py:66).
      perplexity: scalar codebook-usage perplexity (vq/vq.py:71-72).
    """

    quantized: jnp.ndarray
    indices: jnp.ndarray
    commitment_loss: jnp.ndarray
    perplexity: jnp.ndarray


def vq_init(
    key: jax.Array,
    *,
    num_latents: int,
    num_embeddings: int,
    embedding_dim: int,
    dtype: jnp.dtype = jnp.float32,
) -> VQState:
    """Random-normal codebook, unit cluster sizes (vq/vq.py:15-19)."""
    codebook = jax.random.normal(
        key, (num_latents, num_embeddings, embedding_dim), dtype=dtype
    )
    return VQState(
        codebook=codebook,
        cluster_size=jnp.ones((num_latents, num_embeddings), dtype=dtype),
        activation_count=jnp.zeros((num_latents, num_embeddings), dtype=dtype),
        accumulated_error=jnp.zeros((num_latents, num_embeddings), dtype=dtype),
    )


def _flatten(x: jnp.ndarray, num_latents: int, embedding_dim: int) -> jnp.ndarray:
    """Reshape input to (N, num_latents, embedding_dim) (vq/vq.py:26)."""
    return x.reshape(-1, num_latents, embedding_dim)


def codebook_distances(codebook: jnp.ndarray, flat_x: jnp.ndarray) -> jnp.ndarray:
    """Squared L2 distances (N, L, K) via the matmul identity.

    Equivalent to the broadcast form at vq/vq.py:29 but MXU-friendly: the only
    O(N*L*K*D) term is a batched matmul.
    """
    # flat_x: (N, L, D); codebook: (L, K, D)
    x_sq = jnp.sum(flat_x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)  # (N, L, 1)
    e_sq = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1)  # (L, K)
    cross = jnp.einsum(
        "nld,lkd->nlk", flat_x, codebook, preferred_element_type=jnp.float32
    )
    return x_sq + e_sq[None, :, :] - 2.0 * cross


def vq_encode(state: VQState, x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-codebook indices, shape x.shape[:-1] with trailing latent axis.

    Mirrors `VectorQuantizerEMA.encode` (vq/vq.py:83-86): the input's last
    dimension is `embedding_dim` and the second-to-last (implicitly, via
    reshape) the latent index.
    """
    flat_x = _flatten(x, state.num_latents, state.embedding_dim)
    distances = codebook_distances(state.codebook, flat_x)
    indices = jnp.argmin(distances, axis=-1).astype(jnp.int32)  # (N, L)
    return indices.reshape(x.shape[:-1])


def vq_decode(state: VQState, indices: jnp.ndarray) -> jnp.ndarray:
    """Codebook lookup; mirrors `decode` (vq/vq.py:88-93).

    `indices` has an arbitrary leading shape whose flattened trailing layout is
    (N, num_latents); output gains a trailing embedding_dim axis.
    """
    flat_idx = indices.reshape(-1, state.num_latents)  # (N, L)
    # take per-latent: codebook (L, K, D), flat_idx (N, L) -> (N, L, D).
    # mode='clip' keeps out-of-range indices (e.g. a mask token >= K fed to a
    # frozen tokenizer) finite; the reference clamps them to 0 before decoding
    # (minecraft/sparse_diffusion.py:121) — callers that need that exact
    # behavior mask first, but nothing ever decodes to NaN.
    quantized = jnp.take_along_axis(
        state.codebook[None, :, :, :],
        flat_idx[:, :, None, None],
        axis=2,
        mode="clip",
    ).squeeze(2)
    return quantized.reshape(*indices.shape, state.embedding_dim)


def vq_apply(
    state: VQState,
    x: jnp.ndarray,
    *,
    train: bool,
    decay: float = 0.99,
    eps: float = 1e-5,
    laplace_smoothing: bool = True,
) -> Tuple[VQOutput, VQState]:
    """Quantize `x`; when `train`, also EMA-update the codebook.

    Functional equivalent of `VectorQuantizerEMA.forward` (vq/vq.py:24-74):
    nearest-code lookup, straight-through estimator, commitment loss,
    perplexity, and (training only) the Laplace-smoothed EMA codebook update.
    Activation / error statistics are accumulated in both modes exactly as the
    reference does via buffer mutation.

    Under pjit with `x` batch-sharded over a mesh axis, the reductions below
    (`one-hot sums`, `dw`, perplexity means) are global-view and XLA inserts
    the cross-device psums — the multi-chip generalization the reference
    lacked (SURVEY.md §2.2).
    """
    L, K, D = state.codebook.shape
    flat_x = _flatten(x, L, D)
    n = flat_x.shape[0]

    distances = codebook_distances(state.codebook, flat_x)  # (N, L, K)
    indices = jnp.argmin(distances, axis=-1).astype(jnp.int32)  # (N, L)
    quantized = vq_decode(state, indices)  # (N, L, D)

    # per-code stats (vq/vq.py:34-35, 43): one-hot sums over the batch
    onehot = jax.nn.one_hot(indices, K, dtype=jnp.float32)  # (N, L, K)
    onehot_sum = jnp.sum(onehot, axis=0)  # (L, K)
    sq_err = jnp.sum(
        (quantized - flat_x).astype(jnp.float32) ** 2, axis=-1
    )  # (N, L)
    err_sum = jnp.einsum("nl,nlk->lk", sq_err, onehot)

    new_activation = state.activation_count + onehot_sum
    new_error = state.accumulated_error + jax.lax.stop_gradient(err_sum)

    if train:
        # EMA cluster size + Laplace smoothing (vq/vq.py:52-57)
        cluster_size = state.cluster_size * decay + onehot_sum * (1.0 - decay)
        if laplace_smoothing:
            total = jnp.sum(cluster_size, axis=-1, keepdims=True)
            smoothed = (cluster_size + eps) / (total + K * eps) * total
        else:
            smoothed = cluster_size
        # dw: per-code sum of assigned inputs (vq/vq.py:45), normalized by the
        # smoothed cluster size and blended into the codebook (vq/vq.py:63-64).
        dw = jnp.einsum(
            "nlk,nld->lkd",
            onehot,
            jax.lax.stop_gradient(flat_x).astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        dw = dw / smoothed[:, :, None]
        codebook = state.codebook * decay + dw.astype(state.codebook.dtype) * (
            1.0 - decay
        )
    else:
        cluster_size = state.cluster_size
        codebook = state.codebook

    new_state = VQState(
        codebook=codebook,
        cluster_size=cluster_size,
        activation_count=new_activation,
        accumulated_error=new_error,
    )

    commitment_loss = jnp.mean(
        (jax.lax.stop_gradient(quantized.reshape(x.shape)) - x) ** 2
    )
    # straight-through estimator (vq/vq.py:69)
    quantized_st = x + jax.lax.stop_gradient(quantized.reshape(x.shape) - x)

    avg_probs = onehot_sum / jnp.maximum(n, 1)  # (L, K)
    perplexity = jnp.exp(
        -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)) / L
    )

    out = VQOutput(
        quantized=quantized_st,
        indices=indices,
        commitment_loss=commitment_loss,
        perplexity=perplexity,
    )
    return out, new_state


def vq_apply_fused(
    state: VQState,
    x: jnp.ndarray,
    *,
    train: bool,
    decay: float = 0.99,
    eps: float = 1e-5,
    laplace_smoothing: bool = True,
    interpret: bool = False,
) -> Tuple[VQOutput, VQState]:
    """`vq_apply` with the Pallas fused search+stats kernel on the hot path.

    Identical semantics to :func:`vq_apply` for the single-latent case; the
    (N, K) one-hot never touches HBM (kernels/vq_kernels.py). Falls back to
    the XLA path for multi-latent codebooks. Gradients are exact: the kernel
    is wrapped in `stop_gradient` and the two differentiable outputs
    (commitment loss, straight-through `quantized`) are reassembled from `x`
    outside it — the same places `vq_apply` stops gradients anyway.

    Note for pjit data parallelism: a `pallas_call` is an opaque custom call
    XLA cannot shard; use :func:`vq_apply` (global-view reductions -> psum)
    when `x` is sharded over a mesh axis. This path is for the single-chip
    hot loop.
    """
    L, K, D = state.codebook.shape
    if L != 1:
        return vq_apply(
            state, x, train=train, decay=decay, eps=eps,
            laplace_smoothing=laplace_smoothing,
        )
    from world_modelz_tpu.kernels.vq_kernels import vq_train_stats_pallas

    flat_x = _flatten(x, L, D)
    n = flat_x.shape[0]
    idx, q, cnt, err, dw = jax.lax.stop_gradient(
        vq_train_stats_pallas(
            jax.lax.stop_gradient(flat_x[:, 0, :]),
            state.codebook[0],
            interpret=interpret,
        )
    )
    indices = idx[:, None]  # (N, L=1)
    onehot_sum = cnt[None, :]  # (L, K)
    quantized = q[:, None, :]  # (N, L, D)

    new_activation = state.activation_count + onehot_sum
    new_error = state.accumulated_error + err[None, :]

    if train:
        cluster_size = state.cluster_size * decay + onehot_sum * (1.0 - decay)
        if laplace_smoothing:
            total = jnp.sum(cluster_size, axis=-1, keepdims=True)
            smoothed = (cluster_size + eps) / (total + K * eps) * total
        else:
            smoothed = cluster_size
        dw_n = dw[None, :, :] / smoothed[:, :, None]
        codebook = state.codebook * decay + dw_n.astype(
            state.codebook.dtype
        ) * (1.0 - decay)
    else:
        cluster_size = state.cluster_size
        codebook = state.codebook

    new_state = VQState(
        codebook=codebook,
        cluster_size=cluster_size,
        activation_count=new_activation,
        accumulated_error=new_error,
    )

    q_full = quantized.reshape(x.shape).astype(x.dtype)
    commitment_loss = jnp.mean((jax.lax.stop_gradient(q_full) - x) ** 2)
    quantized_st = x + jax.lax.stop_gradient(q_full - x)

    avg_probs = onehot_sum / jnp.maximum(n, 1)
    perplexity = jnp.exp(
        -jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)) / L
    )
    out = VQOutput(
        quantized=quantized_st,
        indices=indices,
        commitment_loss=commitment_loss,
        perplexity=perplexity,
    )
    return out, new_state


def vq_decode_masked(
    state: VQState, indices: jnp.ndarray, mask_token: int
) -> jnp.ndarray:
    """Decode with a virtual all-zeros mask-token embedding.

    The masked-denoise prototype appends a zero vector to the codebook so the
    mask token decodes to 0 (`add_zero_mask_token`,
    masked_denoise_prototype/vectorquantizer.py:24-28); here the codebook
    stays untouched and masked positions are zeroed after the lookup.
    """
    decoded = vq_decode(state, indices)
    return jnp.where(
        (indices == mask_token)[..., None], 0.0, decoded
    )


def vq_reuse_inactive(state: VQState) -> Tuple[VQState, jnp.ndarray]:
    """Move codes with zero activity toward the most active codes.

    Fixed-shape reformulation of `reuse_inactive` (vq/vq.py:95-106): the
    reference pairs the i-th dead code (ascending index order) with the i-th
    most-active code via a dynamic `topk(num_dead)`. We compute, per latent,
    the rank of each dead code among the dead (cumsum of the dead mask), index
    the activity-descending order with that rank, and blend
    ``0.1 * dead + 0.9 * donor`` under the mask — identical semantics, static
    shapes, jit-compatible.

    Returns the new state and the total number of reused codes.
    """
    dead = state.activation_count == 0  # (L, K)
    # donors: codebook entries sorted by activity, descending (vq/vq.py:102)
    donor_order = jnp.argsort(-state.activation_count, axis=-1)  # (L, K)
    # rank of each position among dead entries of its latent (0-based)
    rank = jnp.cumsum(dead.astype(jnp.int32), axis=-1) - 1
    rank = jnp.clip(rank, 0, state.num_embeddings - 1)
    donor_idx = jnp.take_along_axis(donor_order, rank, axis=-1)  # (L, K)
    donors = jnp.take_along_axis(state.codebook, donor_idx[:, :, None], axis=1)
    new_codebook = jnp.where(
        dead[:, :, None], state.codebook * 0.1 + donors * 0.9, state.codebook
    )
    total_reused = jnp.sum(dead.astype(jnp.int32))
    return state.replace(codebook=new_codebook), total_reused


def vq_reset_stats(state: VQState) -> VQState:
    """Zero the activation/error statistics (vq/vq.py:108-110)."""
    return state.replace(
        activation_count=jnp.zeros_like(state.activation_count),
        accumulated_error=jnp.zeros_like(state.accumulated_error),
    )


# ---------------------------------------------------------------------------
# Classic single-codebook variant (VectorQuantizerEMA1)
# ---------------------------------------------------------------------------


@struct.dataclass
class VQ1State:
    """State of the classic single-codebook EMA quantizer.

    Functional port of `VectorQuantizerEMA1` (vq-video-diffusion/vq.py:114-174)
    which EMA-tracks the *weighted input sum* (`ema_w`) separately and divides
    by the EMA cluster size each step.
    """

    codebook: jnp.ndarray  # (K, D)
    ema_cluster_size: jnp.ndarray  # (K,)
    ema_w: jnp.ndarray  # (K, D)


def vq1_init(
    key: jax.Array, *, num_embeddings: int, embedding_dim: int
) -> VQ1State:
    k1, k2 = jax.random.split(key)
    return VQ1State(
        codebook=jax.random.normal(k1, (num_embeddings, embedding_dim)),
        ema_cluster_size=jnp.zeros((num_embeddings,)),
        ema_w=jax.random.normal(k2, (num_embeddings, embedding_dim)),
    )


def vq1_apply(
    state: VQ1State,
    x: jnp.ndarray,
    *,
    train: bool,
    decay: float = 0.99,
    eps: float = 1e-5,
) -> Tuple[VQOutput, VQ1State]:
    """Single-codebook EMA quantization (vq-video-diffusion/vq.py:131-174)."""
    K, D = state.codebook.shape
    flat_x = x.reshape(-1, D)
    distances = (
        jnp.sum(flat_x**2, axis=1, keepdims=True)
        + jnp.sum(state.codebook**2, axis=1)
        - 2.0
        * jnp.dot(flat_x, state.codebook.T, preferred_element_type=jnp.float32)
    )
    indices = jnp.argmin(distances, axis=-1).astype(jnp.int32)  # (N,)
    onehot = jax.nn.one_hot(indices, K, dtype=jnp.float32)

    if train:
        cluster = state.ema_cluster_size * decay + jnp.sum(onehot, axis=0) * (
            1.0 - decay
        )
        n = jnp.sum(cluster)
        cluster = (cluster + eps) / (n + K * eps) * n
        dw = jnp.dot(
            onehot.T,
            jax.lax.stop_gradient(flat_x),
            preferred_element_type=jnp.float32,
        )
        ema_w = state.ema_w * decay + dw * (1.0 - decay)
        codebook = ema_w / cluster[:, None]
        new_state = VQ1State(
            codebook=codebook, ema_cluster_size=cluster, ema_w=ema_w
        )
    else:
        new_state = state

    quantized = jnp.take(new_state.codebook, indices, axis=0).reshape(x.shape)
    commitment_loss = jnp.mean((jax.lax.stop_gradient(quantized) - x) ** 2)
    quantized_st = x + jax.lax.stop_gradient(quantized - x)
    avg_probs = jnp.mean(onehot, axis=0)
    perplexity = jnp.exp(-jnp.sum(avg_probs * jnp.log(avg_probs + 1e-10)))
    out = VQOutput(
        quantized=quantized_st,
        indices=indices,
        commitment_loss=commitment_loss,
        perplexity=perplexity,
    )
    return out, new_state
