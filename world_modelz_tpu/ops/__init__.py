"""Pure functional math ops: quantization, SOM, attention."""

from world_modelz_tpu.ops.vq import (
    VQState,
    VQOutput,
    vq_init,
    vq_apply,
    vq_apply_fused,
    vq_encode,
    vq_decode,
    vq_reuse_inactive,
    vq_reset_stats,
)

__all__ = [
    "VQState",
    "VQOutput",
    "vq_init",
    "vq_apply",
    "vq_apply_fused",
    "vq_encode",
    "vq_decode",
    "vq_reuse_inactive",
    "vq_reset_stats",
]
