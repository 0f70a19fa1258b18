#!/usr/bin/env python
"""Launcher matching the reference script name; delegates to
world_modelz_tpu.cli.sample_frames."""
from world_modelz_tpu.cli.sample_frames import main

if __name__ == "__main__":
    main()
