"""Sequence-parallel local 3D attention via halo exchange.

New TPU-native capability (SURVEY.md §5 'long-context'): the reference
scales sequence length only algorithmically (windowed attention, sparse
subsets); it has no distribution story. Because local 3D attention's
receptive field along time is only `e_s` frames, sharding the frame axis S
over a mesh axis needs just an `e_s`-deep halo exchange between neighboring
shards — a single `ppermute` each way over ICI — after which every shard
computes its windowed attention locally. Communication volume is
O(e_s * H * W * D) per shard regardless of S, so clips scale linearly with
the number of chips.

`local3d_attention_seq` is a drop-in for
`models.attention.local3d_attention` inside `shard_map` with the frame axis
sharded; `tests/test_sequence_parallel.py` checks exact parity against the
unsharded reference on a CPU mesh.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from world_modelz_tpu.models.attention import (
    NEG_INF,
    _spatial_window_mask,
)


def _halo_exchange(
    t: jnp.ndarray, es: int, axis_name: str
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exchange es boundary frames with both neighbors along `axis_name`.

    t: (B, S_loc, HW, dh) local shard. Returns (left_halo, right_halo), each
    (B, es, HW, dh); ring wrap-around values are zeroed at the global borders
    (they are masked out anyway, matching the reference's zero padding).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    # receive the last es frames of the LEFT neighbor
    right_send = [(i, (i + 1) % n) for i in range(n)]
    left_halo = jax.lax.ppermute(t[:, -es:], axis_name, right_send)
    # receive the first es frames of the RIGHT neighbor
    left_send = [(i, (i - 1) % n) for i in range(n)]
    right_halo = jax.lax.ppermute(t[:, :es], axis_name, left_send)
    left_halo = jnp.where(idx == 0, 0.0, left_halo)
    right_halo = jnp.where(idx == n - 1, 0.0, right_halo)
    return left_halo, right_halo


def local3d_attention_seq(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    extents: Tuple[int, int, int],
    heads: int,
    axis_name: str,
    global_seq: int,
) -> jnp.ndarray:
    """Windowed space-time attention with the S axis sharded over
    `axis_name`.

    Args:
      q, k, v: (B, S_loc, H, W, heads*dim_head) — the local frame shard.
      global_seq: total S across shards (for border masking).

    Requires e_s <= S_loc (one-hop halos). Returns the local output shard.
    """
    es, eh, ew = extents
    b, s_loc, h, w, inner = q.shape
    if es > s_loc:
        raise ValueError(
            f"extent {es} exceeds the local shard length {s_loc}; "
            "use fewer sequence shards"
        )
    dh = inner // heads
    hw = h * w
    ts = 2 * es + 1

    def to_heads(t):
        t = t.reshape(b, s_loc, hw, heads, dh)
        return t.transpose(0, 3, 1, 2, 4).reshape(b * heads, s_loc, hw, dh)

    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)

    if es > 0:
        kl, kr = _halo_exchange(kh, es, axis_name)
        vl, vr = _halo_exchange(vh, es, axis_name)
        k_pad = jnp.concatenate([kl, kh, kr], axis=1)  # (BH, S_loc+2es, ...)
        v_pad = jnp.concatenate([vl, vh, vr], axis=1)
    else:
        k_pad, v_pad = kh, vh

    # stacked[:, t, d] = k_pad[:, t + d] for d in [0, Ts)
    k_stack = jnp.stack(
        [k_pad[:, d : d + s_loc] for d in range(ts)], axis=2
    )  # (BH, S_loc, Ts, HW, dh)
    v_stack = jnp.stack([v_pad[:, d : d + s_loc] for d in range(ts)], axis=2)

    scale = dh**-0.5
    scores = (
        jnp.einsum(
            "zsqd,zstkd->zsqtk", qh, k_stack,
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # (BH, S_loc, HW, Ts, HW)

    # masks: spatial window (static) + global frame validity (shard-aware)
    spatial = jnp.asarray(_spatial_window_mask(h, w, eh, ew))  # (HW, HW)
    shard = jax.lax.axis_index(axis_name)
    global_t = shard * s_loc + jnp.arange(s_loc)  # (S_loc,)
    key_frame = global_t[:, None] + jnp.arange(-es, es + 1)[None, :]
    temporal_bad = (key_frame < 0) | (key_frame >= global_seq)  # (S_loc, Ts)
    bad = (
        spatial[None, :, None, :]
        | temporal_bad[:, None, :, None]
    )  # (S_loc, HW, Ts, HW)
    scores = scores + jnp.where(bad, NEG_INF, 0.0)[None]

    attn = jax.nn.softmax(
        scores.reshape(b * heads, s_loc, hw, ts * hw), axis=-1
    ).reshape(scores.shape)
    out = jnp.einsum("zsqtk,zstkd->zsqd", attn.astype(v_stack.dtype), v_stack)
    return (
        out.reshape(b, heads, s_loc, hw, dh)
        .transpose(0, 2, 3, 1, 4)
        .reshape(b, s_loc, h, w, inner)
    )


def seq_sharded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    extents: Tuple[int, int, int],
    heads: int,
    mesh,
    axis_name: str = "seq",
    batch_axis: str = "data",
) -> jnp.ndarray:
    """Global-view drop-in for `models.attention.local3d_attention` with the
    frame axis sharded over ``mesh[axis_name]`` (context parallelism).

    Composable with data parallelism: the batch axis keeps its `batch_axis`
    sharding inside the shard_map (specs mention both axes). Differentiable —
    the halo ppermutes transpose to the reverse permutation in the backward
    pass, so this can sit inside a training step. Inner feature dims ride
    unsharded through the attention; tensor-parallel param rules still apply
    to the surrounding projections.
    """
    from jax.sharding import PartitionSpec as P

    b_ax = batch_axis if batch_axis in mesh.axis_names else None
    spec = P(b_ax, axis_name)
    fn = functools.partial(
        local3d_attention_seq,
        extents=extents,
        heads=heads,
        axis_name=axis_name,
        global_seq=q.shape[1],
    )
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )(q, k, v)


def make_seq_sharded_attention(
    mesh, extents: Tuple[int, int, int], heads: int, global_seq: int,
    axis_name: str = "data",
):
    """Build a shard_map'd attention over `mesh[axis_name]` sharding S.

    Returns fn(q, k, v) taking GLOBAL (B, S, H, W, inner) arrays sharded (or
    shardable) over the frame axis and returning the global output.
    """
    from jax.sharding import PartitionSpec as P

    spec = P(None, axis_name)

    fn = functools.partial(
        local3d_attention_seq,
        extents=extents,
        heads=heads,
        axis_name=axis_name,
        global_seq=global_seq,
    )
    return jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
