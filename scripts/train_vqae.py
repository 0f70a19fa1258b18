#!/usr/bin/env python
"""Launcher matching the reference script name; delegates to
world_modelz_tpu.cli.train_vqae."""
from world_modelz_tpu.cli.train_vqae import main

if __name__ == "__main__":
    main()
