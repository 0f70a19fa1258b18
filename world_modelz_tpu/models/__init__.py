"""flax.linen model definitions (NHWC / (B,S,H,W,D) TPU-native layouts)."""

from world_modelz_tpu.models.conv import (
    Residual,
    ResidualStack,
    SimpleResidualEncoder,
    UpscaleResidual,
    SimpleResidualDecoder,
)
from world_modelz_tpu.models.tokenizer import (
    VQAutoEncoder,
    TokenizerState,
)

__all__ = [
    "Residual",
    "ResidualStack",
    "SimpleResidualEncoder",
    "UpscaleResidual",
    "SimpleResidualDecoder",
    "VQAutoEncoder",
    "TokenizerState",
]
