#!/usr/bin/env python
"""Launcher matching som-diffusion/finetune_ae.py; delegates to
world_modelz_tpu.cli.som_pipeline.main_finetune_ae."""
from world_modelz_tpu.cli.som_pipeline import main_finetune_ae as main

if __name__ == "__main__":
    main()
