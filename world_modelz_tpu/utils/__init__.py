"""Config, logging, and image/GIF utilities."""

from world_modelz_tpu.utils.config import dataclass_cli, str2bool
from world_modelz_tpu.utils.image import make_grid, save_image, save_gif
from world_modelz_tpu.utils.logging import MetricLogger
from world_modelz_tpu.utils.profiling import benchmark_fn, count_parameters, trace

__all__ = [
    "dataclass_cli",
    "str2bool",
    "make_grid",
    "save_image",
    "save_gif",
    "MetricLogger",
    "benchmark_fn",
    "count_parameters",
    "trace",
]
