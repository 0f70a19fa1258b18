"""Expert parallelism: mixture-of-experts FFN with capacity-based dispatch.

The reference has no MoE (SURVEY.md §2.2 — no expert parallelism anywhere);
this completes the parallelism layer the TPU-native way. The formulation is
the classic dispatch-combine einsum pair (Shazeer et al.; the standard
Mesh-TensorFlow / GSPMD recipe):

  gate      = softmax(x @ Wg)                       (B, N, E)
  dispatch  = one-hot(top-1 expert, capacity slot)  (B, N, E, C) {0, 1}
  expert_in = einsum('bnec,bnd->ebcd')              per-expert token batches
  expert_out= FFN_e(expert_in)                      batched over E
  y         = einsum('bnec,ebcd->bnd', dispatch * gate, expert_out)

Everything is a fixed-shape matmul: no ragged shapes, no host routing. Under
``jit`` with the expert axis of the stacked FFN parameters and of the
``expert_in/out`` tensors sharded over an ``'expert'`` mesh axis, XLA lowers
the dispatch/combine einsums to all-to-alls over ICI — expert parallelism
without a single hand-written collective, exactly like the data-parallel
psums elsewhere in this package.

Tokens beyond an expert's capacity are dropped (output 0 for that token's
expert contribution — residual connections carry them), the standard
capacity-factor trade. Set ``capacity >= N`` for lossless routing.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class MoEParams(NamedTuple):
    """Stacked expert FFN + router parameters.

    w_gate: (D, E) router.
    w_in:   (E, D, H) expert up-projections.   b_in:  (E, H)
    w_out:  (E, H, D) expert down-projections. b_out: (E, D)
    """

    w_gate: jnp.ndarray
    w_in: jnp.ndarray
    b_in: jnp.ndarray
    w_out: jnp.ndarray
    b_out: jnp.ndarray


def moe_init(
    key: jax.Array, dim: int, hidden: int, num_experts: int,
    dtype=jnp.float32,
) -> MoEParams:
    kg, ki, ko = jax.random.split(key, 3)
    scale_in = dim**-0.5
    scale_out = hidden**-0.5
    return MoEParams(
        w_gate=jax.random.normal(kg, (dim, num_experts), dtype) * scale_in,
        w_in=jax.random.normal(ki, (num_experts, dim, hidden), dtype)
        * scale_in,
        b_in=jnp.zeros((num_experts, hidden), dtype),
        w_out=jax.random.normal(ko, (num_experts, hidden, dim), dtype)
        * scale_out,
        b_out=jnp.zeros((num_experts, dim), dtype),
    )


def moe_ffn(
    params: MoEParams,
    x: jnp.ndarray,
    *,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-1 routed expert FFN.

    Args:
      x: (B, N, D) tokens.
      capacity: slots per expert per batch row. Tokens routed to a full
        expert are dropped (contribute 0). `capacity >= N` is lossless.

    Returns:
      (y (B, N, D), aux_loss scalar) — aux_loss is the standard load-balance
      penalty E * sum_e(mean_gate_e * mean_assign_e).
    """
    b, n, d = x.shape
    e = params.w_gate.shape[1]

    logits = x @ params.w_gate  # (B, N, E)
    gate = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    expert = jnp.argmax(gate, axis=-1)  # (B, N) top-1
    sel = jax.nn.one_hot(expert, e, dtype=gate.dtype)  # (B, N, E)
    gate_top = jnp.sum(gate * sel, axis=-1)  # (B, N)

    # capacity slot of each token within its expert: running count of prior
    # same-expert assignments along the token axis
    slot = jnp.cumsum(sel, axis=1) * sel  # (B, N, E); 1-based where selected
    slot_idx = (jnp.sum(slot, axis=-1) - 1.0).astype(jnp.int32)  # (B, N)
    keep = slot_idx < capacity
    slot_oh = jax.nn.one_hot(
        jnp.where(keep, slot_idx, capacity), capacity, dtype=gate.dtype
    )  # (B, N, C) — overflow maps past the last slot -> all-zero row
    dispatch = sel[:, :, :, None] * slot_oh[:, :, None, :]  # (B, N, E, C)

    xin = x.astype(jnp.float32)
    expert_in = jnp.einsum(
        "bnec,bnd->ebcd", dispatch, xin, preferred_element_type=jnp.float32
    )  # (E, B, C, D)
    h = jnp.einsum(
        "ebcd,edh->ebch", expert_in, params.w_in.astype(jnp.float32)
    ) + params.b_in[:, None, None, :].astype(jnp.float32)
    h = jax.nn.gelu(h)
    expert_out = jnp.einsum(
        "ebch,ehd->ebcd", h, params.w_out.astype(jnp.float32)
    ) + params.b_out[:, None, None, :].astype(jnp.float32)

    combine = dispatch * gate_top[:, :, None, None]  # weight by gate prob
    y = jnp.einsum(
        "bnec,ebcd->bnd", combine, expert_out,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)

    # load-balance auxiliary (Switch Transformer eq. 4)
    density = jnp.mean(sel, axis=(0, 1))  # fraction routed per expert
    density_proxy = jnp.mean(gate, axis=(0, 1))
    aux = jnp.sum(density * density_proxy) * e
    return y, aux


def moe_reference(params: MoEParams, x: jnp.ndarray) -> jnp.ndarray:
    """Per-token dense evaluation of the same routing (no capacity, no
    dispatch tensors) — the golden reference for tests."""
    gate = jax.nn.softmax(
        (x @ params.w_gate).astype(jnp.float32), axis=-1
    )
    expert = jnp.argmax(gate, axis=-1)
    gate_top = jnp.take_along_axis(gate, expert[..., None], axis=-1)[..., 0]

    def one_token(xi, ei, gi):
        h = jax.nn.gelu(
            xi.astype(jnp.float32) @ params.w_in[ei].astype(jnp.float32)
            + params.b_in[ei]
        )
        return (
            (h @ params.w_out[ei].astype(jnp.float32) + params.b_out[ei])
            * gi
        ).astype(xi.dtype)

    flat = jax.vmap(one_token)(
        x.reshape(-1, x.shape[-1]),
        expert.reshape(-1),
        gate_top.reshape(-1),
    )
    return flat.reshape(x.shape)


def expert_shardings(mesh, axis: str = "expert"):
    """NamedShardings placing the expert axis of MoEParams on `mesh[axis]`
    (router replicated)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return MoEParams(
        w_gate=NamedSharding(mesh, P()),
        w_in=NamedSharding(mesh, P(axis)),
        b_in=NamedSharding(mesh, P(axis)),
        w_out=NamedSharding(mesh, P(axis)),
        b_out=NamedSharding(mesh, P(axis)),
    )
