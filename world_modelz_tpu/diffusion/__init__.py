"""Diffusion processes: masked discrete diffusion + continuous DDPM."""

from world_modelz_tpu.diffusion.masked import (
    corrupt_tokens,
    top_k_logits,
    unmask_frame,
    rollout_frames,
)
from world_modelz_tpu.diffusion.sparse import (
    sample_flat_positions,
    sample_time_dependent,
    sparse_denoise_volume,
)

__all__ = [
    "corrupt_tokens",
    "top_k_logits",
    "unmask_frame",
    "rollout_frames",
    "sample_flat_positions",
    "sample_time_dependent",
    "sparse_denoise_volume",
]
