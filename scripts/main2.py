#!/usr/bin/env python
"""Launcher matching minecraft/main2.py — masked video diffusion on
trajectory data; delegates to world_modelz_tpu.cli.video_diffusion with the
trajectory dataset as default (pass --dataset minerl for real MineRL data)."""
import sys

from world_modelz_tpu.cli.video_diffusion import main

if __name__ == "__main__":
    argv = sys.argv[1:]
    if not any(a.startswith("--dataset") for a in argv):
        argv = ["--dataset", "synthetic"] + argv
    main(argv)
