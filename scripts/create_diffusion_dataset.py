#!/usr/bin/env python
"""Launcher matching som-diffusion/create_diffusion_dataset.py; delegates to
world_modelz_tpu.cli.som_pipeline.main_create_dataset."""
from world_modelz_tpu.cli.som_pipeline import main_create_dataset as main

if __name__ == "__main__":
    main()
