#!/usr/bin/env python
"""Launcher matching vq-video-diffusion/masked_denoise_prototype/main.py;
delegates to world_modelz_tpu.cli.masked_denoise."""
from world_modelz_tpu.cli.masked_denoise import main

if __name__ == "__main__":
    main()
