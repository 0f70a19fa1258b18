"""Command-line entry points mirroring the reference scripts.

Each module exposes a config dataclass, a `train(cfg)`/`run(cfg)` function,
and a `main(argv)` CLI wrapper. Thin launcher scripts with the reference's
original filenames live in `scripts/` at the repo root.
"""
