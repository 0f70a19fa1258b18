#!/usr/bin/env python
"""Launcher matching the reference script name; delegates to
world_modelz_tpu.cli.make_gif."""
from world_modelz_tpu.cli.make_gif import main

if __name__ == "__main__":
    main()
