"""Pallas TPU kernels for the hot ops.

Each kernel has an XLA reference implementation elsewhere in the package and
golden tests comparing the two (tests/test_kernels.py) — the verification
idiom of the reference's Triton prototype
(vq-video-diffusion/triton_prototpye/local_3d_attention_triton1.py:276-319).
"""

from world_modelz_tpu.kernels.vq_kernels import (
    vq_encode_pallas,
    vq_train_stats_pallas,
)
from world_modelz_tpu.kernels.local3d import local3d_attention_pallas

__all__ = [
    "vq_encode_pallas",
    "vq_train_stats_pallas",
    "local3d_attention_pallas",
]
