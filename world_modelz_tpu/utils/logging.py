"""Metric logging: stdout + JSONL, optional wandb.

The reference logs scalars/images/histograms to wandb every step
(minecraft/main2.py:294-300) behind a `--wandb` switch
(train_vqae.py:245-256). Here the always-on sink is a JSONL file (easy to
plot offline, works in zero-egress environments); wandb attaches on top when
installed and enabled.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional

import numpy as np


class MetricLogger:
    def __init__(
        self,
        output_dir: str,
        name: str,
        use_wandb: bool = False,
        project: Optional[str] = None,
        config: Optional[Dict[str, Any]] = None,
        tags: Optional[str] = None,
    ):
        os.makedirs(output_dir, exist_ok=True)
        self._path = os.path.join(output_dir, f"{name}_metrics.jsonl")
        self._file = open(self._path, "a")
        self._t0 = time.time()
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                wandb.init(
                    project=project or name,
                    config=config or {},
                    tags=(tags or "").split(",") if tags else [],
                    name=name,
                )
                self._wandb = wandb
            except ImportError:
                print("wandb requested but not installed; logging to JSONL only")

    def log(self, step: int, **metrics: Any) -> None:
        record = {"step": step, "t": round(time.time() - self._t0, 3)}
        for k, v in metrics.items():
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, (np.floating, np.integer)):
                v = v.item()
            record[k] = v
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_histogram(
        self, step: int, key: str, values: Any, bins: int = 64
    ) -> None:
        """Histogram parity with the reference's sampler-weight logging
        (minecraft/main2.py:298-300): wandb.Histogram when enabled, and
        always a JSONL record carrying the (counts, edges) np.histogram so
        zero-egress runs keep the full distribution trail."""
        values = np.asarray(values).reshape(-1)
        hist = np.histogram(values, bins=bins)
        record = {
            "step": step,
            "t": round(time.time() - self._t0, 3),
            "histogram": key,
            "counts": hist[0].tolist(),
            "edges": np.round(hist[1], 6).tolist(),
        }
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log(
                {key: self._wandb.Histogram(np_histogram=hist)}, step=step
            )

    def log_image(self, step: int, key: str, image: np.ndarray) -> None:
        """Eval-image parity (main2.py:334-338). The JSONL path writes the
        PNG next to the metrics file and records its relative path (the
        reference silently dropped images when wandb was off)."""
        image = np.asarray(image)
        out_dir = os.path.join(os.path.dirname(self._path), "images")
        os.makedirs(out_dir, exist_ok=True)
        fn = os.path.join(out_dir, f"{key}_{step:07d}.png")
        from world_modelz_tpu.utils.image import save_image

        save_image(image, fn)
        record = {
            "step": step,
            "t": round(time.time() - self._t0, 3),
            "image": key,
            "path": os.path.relpath(fn, os.path.dirname(self._path)),
        }
        self._file.write(json.dumps(record) + "\n")
        self._file.flush()
        if self._wandb is not None:
            self._wandb.log({key: self._wandb.Image(image)}, step=step)

    def close(self) -> None:
        self._file.close()
        if self._wandb is not None:
            self._wandb.finish()
