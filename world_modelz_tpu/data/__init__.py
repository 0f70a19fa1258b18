"""Host-side input pipelines.

All sources are numpy-based host generators decoupled from the device step;
`world_modelz_tpu.data.prefetch` overlaps host batch assembly with device
compute (the reference's fill-thread double buffer, re-designed as a bounded
queue — SURVEY.md §5 'race detection').
"""

from world_modelz_tpu.data.device_composite import as_frames, composite_clips
from world_modelz_tpu.data.moving_mnist import MovingMNIST
from world_modelz_tpu.data.trajectory import (
    BufferedTrajectorySampler,
    SyncTrajectorySampler,
    SyntheticTrajectorySource,
    VideoFileTrajectorySource,
)
from world_modelz_tpu.data.images import FileListImageDataset, load_file_list
from world_modelz_tpu.data.prefetch import PrefetchIterator

__all__ = [
    "MovingMNIST",
    "as_frames",
    "composite_clips",
    "BufferedTrajectorySampler",
    "SyncTrajectorySampler",
    "SyntheticTrajectorySource",
    "VideoFileTrajectorySource",
    "FileListImageDataset",
    "load_file_list",
    "PrefetchIterator",
]
