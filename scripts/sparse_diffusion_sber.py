#!/usr/bin/env python
"""Launcher matching minecraft/sparse_diffusion_sber.py — sparse diffusion
with an external pretrained Sber/taming GumbelVQ tokenizer. Requires the
optional taming-transformers + omegaconf packages and a downloaded VQGAN
checkpoint; pass --tokenizer "taming:<config.yaml>,<model.ckpt>".

Delegates to world_modelz_tpu.cli.sparse_diffusion with the external
tokenizer plugged in via world_modelz_tpu.models.external.make_tokenizer."""
import sys

from world_modelz_tpu.cli.sparse_diffusion import main

if __name__ == "__main__":
    main(sys.argv[1:])
