"""Mesh construction and sharding rules (SPMD parallelism layer)."""

from world_modelz_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    clip_sharding,
    replicated,
    shard_params,
    DEFAULT_TP_RULES,
)
from world_modelz_tpu.parallel.sequence import (
    local3d_attention_seq,
    make_seq_sharded_attention,
    seq_sharded_attention,
)
from world_modelz_tpu.parallel.pipeline import (
    microbatch,
    pipeline_apply,
    stack_stage_params,
    unmicrobatch,
)
from world_modelz_tpu.parallel.moe import (
    MoEParams,
    expert_shardings,
    moe_ffn,
    moe_init,
)
from world_modelz_tpu.parallel.fsdp import (
    fsdp_shardings,
    opt_state_shardings,
)
from world_modelz_tpu.parallel.distributed import (
    initialize_distributed,
    shard_host_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "clip_sharding",
    "replicated",
    "shard_params",
    "DEFAULT_TP_RULES",
    "local3d_attention_seq",
    "make_seq_sharded_attention",
    "seq_sharded_attention",
    "MoEParams",
    "expert_shardings",
    "moe_ffn",
    "moe_init",
    "microbatch",
    "pipeline_apply",
    "stack_stage_params",
    "unmicrobatch",
    "fsdp_shardings",
    "opt_state_shardings",
    "initialize_distributed",
    "shard_host_batch",
]
