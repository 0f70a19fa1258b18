"""ZeRO/FSDP-style parameter + optimizer-state sharding over the data axis.

The reference is strictly single-device (SURVEY.md §2.2 — no DDP, no ZeRO,
no sharded optimizers anywhere), so this layer is new TPU-native design. In
the global-view jit model, FSDP is purely a *placement* choice: constrain
each parameter leaf — and its EMA shadow and optimizer moments — to a
PartitionSpec that splits its largest dimension over the mesh's 'data'
axis. XLA's SPMD partitioner then materializes each layer's weights
just-in-time (all-gather on use) and reduce-scatters gradients back to the
owning shards: the ZeRO-3 communication schedule, compiler-scheduled over
ICI instead of hand-written NCCL hooks (the scaling-book FSDP recipe).

Composition with tensor parallelism: leaves matched by a TP rule keep
their 'model'-axis dims and FSDP claims the largest *remaining* dimension
that divides the data-axis size (hybrid sharded data parallelism). Small
leaves — biases, norm scales — stay replicated: gathering a few hundred
floats costs more in collective latency than the bytes it saves.

Memory math (model #3, 12.26M params, Adam, f32): replicated DP keeps
3 copies x 49 MB on every chip; FSDP at n_data=8 keeps ~6.1 MB of
params + 12.2 MB of moments per chip. Irrelevant at this scale, decisive
for the multi-billion-parameter regime this framework targets.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from world_modelz_tpu.parallel.mesh import _flatten_paths, rule_spec

# below this many elements a leaf is not worth gathering: latency-bound
# collectives + padding waste beat the per-chip bytes saved
DEFAULT_MIN_SIZE = 8192


def fsdp_shardings(
    params: Any,
    mesh: Mesh,
    rules: Sequence[Tuple[str, P]] = (),
    axis: str = "data",
    min_size: int = DEFAULT_MIN_SIZE,
) -> Any:
    """NamedSharding pytree splitting each large leaf over `axis`.

    `rules` (the tensor-parallel rules) are applied first; FSDP shards the
    largest dimension the rule left unsharded that is divisible by the
    axis size. Leaves with fewer than `min_size` elements, and leaves with
    no divisible free dimension, keep their rule spec unchanged.
    """
    n = mesh.shape[axis]
    path_strs = _flatten_paths(params)

    def spec_for(path, leaf):
        base = rule_spec(path_strs[tuple(path)], leaf, mesh, rules)
        dims = list(base) + [None] * (leaf.ndim - len(base))
        if n == 1 or leaf.size < min_size:
            return NamedSharding(mesh, base)
        free = [
            d
            for d in range(leaf.ndim)
            if dims[d] is None and leaf.shape[d] % n == 0
        ]
        if not free:
            return NamedSharding(mesh, base)
        dims[max(free, key=lambda d: leaf.shape[d])] = axis
        return NamedSharding(mesh, P(*dims))

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    shardings = [spec_for(path, leaf) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, shardings)


def opt_state_shardings(
    opt_state: Any,
    params: Any,
    param_shardings: Any,
    mesh: Mesh,
) -> Any:
    """Sharding pytree for an optax state, aligned with the params.

    Optimizer moments (Adam mu/nu, MultiSteps grad accumulators, ...) are
    whole param-tree-shaped subtrees inside the optax state, so each state
    leaf whose "/"-joined path *ends with* a parameter's path — and whose
    shape matches that parameter — inherits the parameter's sharding
    (ZeRO: moments live with their owning shard). Everything else (step
    counts, schedule scalars) is replicated. Longest path match wins.
    """
    p_paths = _flatten_paths(params)
    p_flat, _ = jax.tree_util.tree_flatten_with_path(params)
    sh_flat = jax.tree_util.tree_leaves(
        param_shardings, is_leaf=lambda x: isinstance(x, NamedSharding)
    )
    by_path = {}
    for (path, leaf), sh in zip(p_flat, sh_flat):
        by_path[p_paths[tuple(path)]] = (tuple(leaf.shape), sh)

    repl = NamedSharding(mesh, P())
    o_paths = _flatten_paths(opt_state)

    def spec_for(path, leaf):
        s = o_paths[tuple(path)]
        best = None
        for ppath, (shape, sh) in by_path.items():
            if (s == ppath or s.endswith("/" + ppath)) and (
                tuple(getattr(leaf, "shape", ())) == shape
            ):
                if best is None or len(ppath) > len(best[0]):
                    best = (ppath, sh)
        return best[1] if best is not None else repl

    flat, treedef = jax.tree_util.tree_flatten_with_path(opt_state)
    shardings = [spec_for(path, leaf) for path, leaf in flat]
    return jax.tree_util.tree_unflatten(treedef, shardings)
