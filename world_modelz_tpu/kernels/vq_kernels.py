"""Fused VQ nearest-codebook search as a Pallas TPU kernel.

The reference's VQ hot spot is the O(N*K*D) distance tensor materialized per
forward (vq/vq.py:29-30); the XLA path in `ops/vq.py` already reduces that to
a matmul, but still writes the (N, K) score matrix to HBM before the argmin.
This kernel fuses score computation, argmin, and codebook gather in VMEM:
per input tile it

  1. computes `scores = x @ E^T` on the MXU,
  2. reduces `argmin_k(|e_k|^2 - 2 scores)` on the VPU (the |x|^2 term is
     constant per row and dropped — it cannot change the argmin),
  3. emits the selected indices and, optionally, the quantized vectors via a
     one-hot matmul (MXU again — no gather needed).

Grid: one program per tile of N input rows; the codebook stays resident in
VMEM across the whole grid (512 x 64 f32 = 128 KiB).

Golden-tested against `ops.vq.vq_encode` (tests/test_kernels.py), following
the reference's Triton-vs-eager harness idiom
(triton_prototpye/local_3d_attention_triton1.py:276-319).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _vq_kernel(x_ref, e_ref, e_sq_ref, idx_ref, q_ref=None):
    """One tile: x (TN, D), codebook (K, D) -> indices (TN, 1) and, when a
    q_ref output is wired, quantized vectors (TN, D)."""
    x = x_ref[:].astype(jnp.float32)
    e = e_ref[:].astype(jnp.float32)
    # scores on the MXU; |x|^2 is row-constant and irrelevant to the argmin
    scores = jnp.dot(x, e.T, preferred_element_type=jnp.float32)  # (TN, K)
    dist = e_sq_ref[:] - 2.0 * scores  # (TN, K) via broadcast of (1, K)
    idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)  # (TN,)
    idx_ref[:] = idx[:, None]
    if q_ref is not None:
        # quantized = onehot @ E on the MXU. A dynamic in-VMEM gather
        # (jnp.take) would halve the FLOPs but has no Mosaic lowering on
        # TPU today (interpret-only); the one-hot matmul is why this kernel
        # currently trails XLA's fused matmul+argmin+gather for encode+decode
        # (docs/ROADMAP.md) — the index-only variant skips it entirely.
        # HIGHEST precision: this matmul emulates an exact gather; default
        # TPU f32 matmuls use bf16 passes, which would round the selected
        # code vectors by ~1e-2 (the XLA path's take_along_axis is exact).
        k = e.shape[0]
        onehot = (
            idx[:, None]
            == jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], k), 1)
        ).astype(e.dtype)
        q_ref[:] = jnp.dot(
            onehot,
            e,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ).astype(q_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tile_n", "interpret", "return_quantized")
)
def vq_encode_pallas(
    x: jnp.ndarray,
    codebook: jnp.ndarray,
    *,
    tile_n: int = 512,
    interpret: bool = False,
    return_quantized: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Nearest-codebook indices (and quantized vectors) for flat inputs.

    Args:
      x: (N, D) inputs (any leading shape is flattened by callers).
      codebook: (K, D) code vectors (single-latent codebook; the multi-latent
        case loops this kernel per latent or falls back to the XLA path).
      tile_n: rows per grid program.
      interpret: run in the Pallas interpreter (CPU testing).

    Returns:
      (indices (N,) int32, quantized (N, D) of x.dtype).
    """
    n, d = x.shape
    k = codebook.shape[0]
    pad_n = -n % tile_n
    if pad_n:
        x = jnp.pad(x, ((0, pad_n), (0, 0)))
    n_pad = x.shape[0]

    e_sq = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1)[None, :]

    grid = (n_pad // tile_n,)
    in_specs = [
        pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    idx_spec = pl.BlockSpec(
        (tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    q_spec = pl.BlockSpec(
        (tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    cost = pl.CostEstimate(
        flops=2 * n_pad * k * d * 2,
        bytes_accessed=(n_pad * d + k * d + n_pad * (d + 1)) * 4,
        transcendentals=0,
    )
    if return_quantized:
        idx, q = pl.pallas_call(
            _vq_kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=[idx_spec, q_spec],
            out_shape=[
                jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
                jax.ShapeDtypeStruct((n_pad, d), x.dtype),
            ],
            interpret=interpret,
            cost_estimate=cost,
        )(x, codebook, e_sq)
        return idx[:n, 0], q[:n]
    idx = pl.pallas_call(
        functools.partial(_vq_kernel),
        grid=grid,
        in_specs=in_specs,
        out_specs=idx_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        interpret=interpret,
        cost_estimate=cost,
    )(x, codebook, e_sq)
    return idx[:n, 0], None


# ---------------------------------------------------------------------------
# Fused VQ + EMA-statistics training kernel (SURVEY.md §7 step 6a)
# ---------------------------------------------------------------------------


def _vq_train_kernel(
    n_valid, x_ref, e_ref, e_sq_ref, idx_ref, q_ref, cnt_ref, err_ref, dw_ref
):
    """One tile of the fused training pass.

    Per (TN, D) input tile: scores matmul -> argmin -> one-hot (in VMEM,
    never written to HBM — the XLA path materializes the (N, K) one-hot
    twice, for `onehot_sum` and the `dw` einsum, ~N*K*8 bytes of HBM
    traffic this kernel eliminates) -> quantized vectors, per-code counts,
    per-code squared-error sums, and per-code input sums (`dw`), the latter
    three accumulated across the sequential grid into single blocks.
    """
    i = pl.program_id(0)
    x = x_ref[:].astype(jnp.float32)  # (TN, D)
    e = e_ref[:].astype(jnp.float32)  # (K, D)
    tn, d = x.shape
    k = e.shape[0]

    scores = jnp.dot(x, e.T, preferred_element_type=jnp.float32)  # (TN, K)
    dist = e_sq_ref[:] - 2.0 * scores  # |e|^2 - 2 x.e (row-constant |x|^2 off)
    idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)  # (TN,)
    idx_ref[:] = idx[:, None]

    # true squared quantization error: min_k dist + |x|^2 (vq/vq.py:34)
    x_sq = jnp.sum(x * x, axis=-1)  # (TN,)
    min_d = jnp.maximum(jnp.min(dist, axis=-1) + x_sq, 0.0)  # (TN,)

    onehot = (
        idx[:, None] == jax.lax.broadcasted_iota(jnp.int32, (tn, k), 1)
    ).astype(jnp.float32)
    # rows beyond the true N are padding: zero their one-hot so they
    # contribute to nothing (q, cnt, err, dw all flow through onehot)
    row = i * tn + jax.lax.broadcasted_iota(jnp.int32, (tn,), 0)
    onehot = onehot * (row < n_valid).astype(jnp.float32)[:, None]

    # HIGHEST: emulates an exact gather (see _vq_kernel) — default bf16
    # passes would round the selected code vectors
    q_ref[:] = jnp.dot(
        onehot,
        e,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(q_ref.dtype)

    cnt_tile = jnp.sum(onehot, axis=0)[None, :]  # (1, K)
    err_tile = jnp.sum(onehot * min_d[:, None], axis=0)[None, :]  # (1, K)
    dw_tile = jnp.dot(onehot.T, x, preferred_element_type=jnp.float32)  # (K, D)

    @pl.when(i == 0)
    def _init():
        cnt_ref[:] = jnp.zeros_like(cnt_ref)
        err_ref[:] = jnp.zeros_like(err_ref)
        dw_ref[:] = jnp.zeros_like(dw_ref)

    cnt_ref[:] += cnt_tile
    err_ref[:] += err_tile
    dw_ref[:] += dw_tile


@functools.partial(jax.jit, static_argnames=("tile_n", "interpret"))
def vq_train_stats_pallas(
    x: jnp.ndarray,
    codebook: jnp.ndarray,
    *,
    tile_n: int = 512,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused nearest-code search + EMA-statistics for one training step.

    Single pass over (N, D) inputs against a (K, D) codebook producing
    everything `ops.vq.vq_apply` needs (vq/vq.py:29-64) without ever
    writing scores or one-hots to HBM:

    Returns:
      indices (N,) int32, quantized (N, D) f32 (old codebook — the
      reference quantizes before the EMA update), counts (K,) f32,
      err_sums (K,) f32, dw (K, D) f32 (raw per-code input sums).

    Not differentiable — by design: `vq_apply` only ever uses these
    under `stop_gradient` (straight-through estimator; the commitment
    loss differentiates `x`, not the quantization). Golden-tested against
    the XLA path in tests/test_kernels.py.
    """
    n, d = x.shape
    k = codebook.shape[0]
    pad_n = -n % tile_n
    if pad_n:
        x = jnp.pad(x, ((0, pad_n), (0, 0)))
    n_pad = x.shape[0]

    e_sq = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=-1)[None, :]

    grid = (n_pad // tile_n,)
    acc = lambda i: (0, 0)  # noqa: E731 — all programs share the block
    idx, q, cnt, err, dw = pl.pallas_call(
        functools.partial(_vq_train_kernel, n),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), acc, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), acc, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), acc, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), acc, memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), acc, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((k, d), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=3 * 2 * n_pad * k * d,
            bytes_accessed=(n_pad * d * 2 + k * d * 2 + n_pad) * 4,
            transcendentals=0,
        ),
    )(x, codebook, e_sq)
    return idx[:n, 0], q[:n], cnt[0], err[0], dw
