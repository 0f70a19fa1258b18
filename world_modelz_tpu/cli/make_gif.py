"""Assemble frame PNGs into an animated GIF.

Replaces `vq-video-diffusion/make_gif.sh:3` (ImageMagick `convert -delay 20
-loop 0 frame_*.png out.gif`) with a pure-python equivalent.
"""

from __future__ import annotations

import dataclasses
import glob

import numpy as np

from world_modelz_tpu.utils import dataclass_cli, save_gif


@dataclasses.dataclass
class MakeGifConfig:
    pattern: str = "frame_*.png"
    output: str = "out.gif"
    fps: float = 5.0  # make_gif.sh uses -delay 20 (1/100ths) = 5 fps


def run(cfg: MakeGifConfig) -> str:
    from PIL import Image

    files = sorted(glob.glob(cfg.pattern))
    if not files:
        raise FileNotFoundError(f"no frames match {cfg.pattern!r}")
    frames = [
        np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
        for f in files
    ]
    save_gif(frames, cfg.output, fps=cfg.fps)
    print(f"{cfg.output}: {len(frames)} frames")
    return cfg.output


def main(argv=None):
    run(dataclass_cli(MakeGifConfig, argv))


if __name__ == "__main__":
    main()
