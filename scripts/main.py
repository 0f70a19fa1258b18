#!/usr/bin/env python
"""Launcher matching the reference script name; delegates to
world_modelz_tpu.cli.video_diffusion."""
from world_modelz_tpu.cli.video_diffusion import main

if __name__ == "__main__":
    main()
