"""Config, logging, and image/GIF utilities."""

from world_modelz_tpu.utils.config import dataclass_cli, str2bool
from world_modelz_tpu.utils.image import make_grid, save_image, save_gif
from world_modelz_tpu.utils.logging import MetricLogger

__all__ = [
    "dataclass_cli",
    "str2bool",
    "make_grid",
    "save_image",
    "save_gif",
    "MetricLogger",
]
