"""Mesh construction and sharding rules (SPMD parallelism layer)."""

from world_modelz_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_params,
    DEFAULT_TP_RULES,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_params",
    "DEFAULT_TP_RULES",
]
