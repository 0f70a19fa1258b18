"""Frame-export ETL: dump trajectory frames to per-trajectory PNG dirs.

Parity with minecraft/sample_frames.py:178-240: iterate trajectories,
randomized frame skipping (skip_frames_min/max), save frames as PNGs under
`<output_dir>/<trajectory>/`, and write a manifest compatible with
`load_file_list` / FileListImageDataset. Decode failures are skipped per
trajectory (sample_frames.py:231-235).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import List

import numpy as np

from world_modelz_tpu.data.trajectory import (
    SyntheticTrajectorySource,
    TrajectorySource,
)
from world_modelz_tpu.utils import dataclass_cli, save_image


@dataclasses.dataclass
class SampleFramesConfig:
    dataset: str = "synthetic"  # synthetic|minerl
    data_dir: str = ""
    output_dir: str = "outputs/frames"
    skip_frames_min: int = 2
    skip_frames_max: int = 5
    max_trajectories: int = 0  # 0 = all
    manual_seed: int = 0
    file_list_fn: str = "file_list.json"


def make_source(cfg: SampleFramesConfig) -> TrajectorySource:
    if cfg.dataset == "minerl":
        from world_modelz_tpu.data.trajectory import MineRLTrajectorySource

        return MineRLTrajectorySource(["MineRLTreechop-v0"], cfg.data_dir)
    return SyntheticTrajectorySource()


def run(cfg: SampleFramesConfig) -> List[str]:
    rng = np.random.default_rng(cfg.manual_seed)
    source = make_source(cfg)
    os.makedirs(cfg.output_dir, exist_ok=True)
    manifest: List[str] = []

    names = list(source.trajectory_names())
    if cfg.max_trajectories:
        names = names[: cfg.max_trajectories]

    for name in names:
        traj_dir = os.path.join(cfg.output_dir, name.replace("/", "_"))
        os.makedirs(traj_dir, exist_ok=True)
        try:
            count = 0
            skip = 0
            for i, frame in enumerate(source.load_frames(name)):
                if skip > 0:
                    skip -= 1
                    continue
                skip = int(
                    rng.integers(cfg.skip_frames_min, cfg.skip_frames_max + 1)
                )
                fn = os.path.join(traj_dir, f"{count:06d}.png")
                save_image(frame.astype(np.float32) / 255.0, fn)
                manifest.append(os.path.abspath(fn))
                count += 1
            print(f"{name}: {count} frames")
        except Exception as e:  # skip undecodable trajectories (:231-235)
            print(f"{name}: FAILED ({e})")

    manifest_path = os.path.join(cfg.output_dir, cfg.file_list_fn)
    with open(manifest_path, "w") as f:
        json.dump(manifest, f)
    print(f"manifest: {manifest_path} ({len(manifest)} frames)")
    return manifest


def main(argv=None):
    cfg = dataclass_cli(SampleFramesConfig, argv)
    run(cfg)


if __name__ == "__main__":
    main()
