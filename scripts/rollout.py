#!/usr/bin/env python
"""Long-horizon autoregressive rollout service (main.py/main2.py --eval +
make_gif as one command); delegates to world_modelz_tpu.cli.rollout."""
from world_modelz_tpu.cli.rollout import main

if __name__ == "__main__":
    main()
