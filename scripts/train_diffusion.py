#!/usr/bin/env python
"""Launcher matching som-diffusion/train_diffusion.py; delegates to
world_modelz_tpu.cli.som_pipeline.main_train_diffusion."""
from world_modelz_tpu.cli.som_pipeline import main_train_diffusion as main

if __name__ == "__main__":
    main()
