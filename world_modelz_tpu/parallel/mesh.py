"""Device mesh + sharding rules for data/tensor-parallel training.

The reference is strictly single-device (SURVEY.md §2.2 — no DDP/NCCL/MPI
anywhere), so this layer is new design, not a port. The scheme follows the
standard JAX global-view recipe:

- a Mesh with ``('data', 'model')`` axes over ICI;
- the batch sharded over ``data``; every reduction in the train step
  (gradients, VQ EMA statistics, BatchNorm batch stats, perplexity means) is
  written in global view, so XLA lowers them to psums over the mesh — no
  hand-written collectives;
- optional tensor parallelism for the transformer stacks: path-pattern rules
  assign PartitionSpecs to parameter leaves (QKV/MLP kernels column-split on
  the way in, row-split on the way out, biases of row-split layers
  replicated), everything else replicated.

`shard_params` applies rules by substring match on the flattened param path;
unmatched leaves are replicated. All helpers work identically on a CPU test
mesh (`xla_force_host_platform_device_count`) and a real TPU slice.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    n_seq: int = 1,
    n_pipe: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ('data', 'model') mesh; ('data', 'seq', 'model') when
    sequence parallelism is requested (n_seq > 1); ('pipe', 'data', 'model')
    when pipeline parallelism is requested (n_pipe > 1).

    With no arguments: all visible devices on the data axis (pure DP).
    """
    if n_pipe > 1 and n_seq > 1:
        raise ValueError("combine pipe with data/model axes, not seq")
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // (n_model * n_seq * n_pipe)
    used = n_data * n_seq * n_model * n_pipe
    if n_pipe > 1:
        grid = np.array(devices[:used]).reshape(n_pipe, n_data, n_model)
        return Mesh(grid, ("pipe", "data", "model"))
    if n_seq > 1:
        grid = np.array(devices[:used]).reshape(n_data, n_seq, n_model)
        return Mesh(grid, ("data", "seq", "model"))
    grid = np.array(devices[:used]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data"))


def clip_sharding(mesh: Mesh) -> NamedSharding:
    """Shard (B, S, ...) video clips: batch over 'data', frames over 'seq'
    when the mesh carries a sequence axis."""
    if "seq" in mesh.axis_names:
        return NamedSharding(mesh, P("data", "seq"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Tensor-parallel rules for the transformer stacks in this package.
# Matched against "/"-joined parameter paths. Column-parallel layers split
# their output features over 'model'; row-parallel layers split input
# features (XLA inserts the reduce on the way out).
DEFAULT_TP_RULES: Tuple[Tuple[str, P], ...] = (
    # dense transformer attention (models/attention.py DenseAttention)
    (r"to_qkv/kernel$", P(None, "model")),
    (r"attn_\d+/to_[qkv]/kernel$", P(None, "model")),
    (r"to_out/kernel$", P("model", None)),
    # MLPs (FeedForward): first Dense column-parallel, second row-parallel
    (r"ff(_\d+)?/Dense_0/kernel$", P(None, "model")),
    (r"FeedForward_\d+/Dense_0/kernel$", P(None, "model")),
    (r"ff(_\d+)?/Dense_1/kernel$", P("model", None)),
    (r"FeedForward_\d+/Dense_1/kernel$", P("model", None)),
    # MoE FFNs: shard the EXPERT axis over 'model' — expert parallelism on
    # the standard mesh; the dispatch/combine einsums become all-to-alls.
    # The router (w_gate) stays replicated.
    (r"MoEFeedForward_\d+/w_in$", P("model", None, None)),
    (r"MoEFeedForward_\d+/w_out$", P("model", None, None)),
    (r"MoEFeedForward_\d+/b_in$", P("model", None)),
    (r"MoEFeedForward_\d+/b_out$", P("model", None)),
    # vocabulary-sized tables: shard the embedding feature dim stays small;
    # keep replicated (rows are gathered by token id) — no rule needed.
)


def _flatten_paths(tree: Any) -> Dict[Tuple, str]:
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = {}
    for path, _leaf in flat:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            else:
                parts.append(str(p))
        out[tuple(path)] = "/".join(parts)
    return out


def rule_spec(path_str: str, leaf: Any, mesh: Mesh,
              rules: Sequence[Tuple[str, P]]) -> P:
    """PartitionSpec for one leaf under `rules` (regex search on the
    "/"-joined path, first match wins; indivisible matches and unmatched
    leaves fall back to replication)."""
    for pattern, spec in rules:
        if re.search(pattern, path_str):
            ok = True
            for dim, axis in enumerate(spec):
                if axis is None:
                    continue
                size = mesh.shape[axis]
                if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
                    ok = False
                    break
            return spec if ok else P()
    return P()


def shard_params(
    params: Any,
    mesh: Mesh,
    rules: Sequence[Tuple[str, P]] = (),
) -> Any:
    """Build a pytree of NamedShardings for `params`.

    Each leaf's "/"-joined path is tested against `rules` (regex search,
    first match wins); unmatched leaves are replicated. Leaves whose
    matched PartitionSpec doesn't divide the array shape fall back to
    replication (e.g. a model axis larger than a small head dim).
    """
    path_strs = _flatten_paths(params)

    def spec_for(path, leaf):
        return NamedSharding(
            mesh, rule_spec(path_strs[tuple(path)], leaf, mesh, rules)
        )

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = [spec_for(path, leaf) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, shardings)
