"""Tests for config CLI, image grid/GIF writers, and the metric logger."""

import dataclasses
import json
import os
from typing import Tuple

import numpy as np
import pytest

from world_modelz_tpu.utils import (
    MetricLogger,
    dataclass_cli,
    make_grid,
    save_gif,
    save_image,
    str2bool,
)
from world_modelz_tpu.utils.config import config_from_dict, config_to_dict


@dataclasses.dataclass
class _Cfg:
    lr: float = 1e-4
    depth: int = 4
    name: str = "x"
    wandb: bool = False
    extents: Tuple[int, int, int] = (3, 3, 3)


def test_dataclass_cli_defaults_and_overrides():
    cfg = dataclass_cli(_Cfg, [])
    assert cfg == _Cfg()
    cfg = dataclass_cli(
        _Cfg, ["--lr", "5e-5", "--depth", "8", "--wandb", "true",
               "--extents", "3,1,1"]
    )
    assert cfg.lr == 5e-5 and cfg.depth == 8
    assert cfg.wandb is True
    assert cfg.extents == (3, 1, 1)


def test_str2bool():
    assert str2bool("yes") and str2bool("1") and str2bool(True)
    assert not str2bool("No") and not str2bool("0")
    with pytest.raises(Exception):
        str2bool("maybe")


def test_config_dict_roundtrip():
    cfg = _Cfg(extents=(1, 2, 3))
    d = config_to_dict(cfg)
    assert d["extents"] == [1, 2, 3]  # JSON-able
    back = config_from_dict(_Cfg, d)
    assert back == cfg
    # unknown keys ignored
    d["bogus"] = 1
    assert config_from_dict(_Cfg, d) == cfg


def test_make_grid_layout():
    imgs = np.ones((5, 4, 4, 3), np.float32) * 0.5
    grid = make_grid(imgs, nrow=3, pad=1, pad_value=0.0)
    # 2 rows x 3 cols of 4px tiles with 1px padding
    assert grid.shape == (2 * 5 + 1, 3 * 5 + 1, 3)
    assert grid[1, 1, 0] == 0.5 and grid[0, 0, 0] == 0.0


def test_save_image_and_gif(tmp_path):
    from PIL import Image

    img = np.random.default_rng(0).uniform(0, 1, (8, 8, 3)).astype(np.float32)
    p = str(tmp_path / "x.png")
    save_image(img, p)
    assert Image.open(p).size == (8, 8)

    # batch -> grid
    batch = np.stack([img] * 4)
    p2 = str(tmp_path / "grid.png")
    save_image(batch, p2)
    assert os.path.exists(p2)

    gif = str(tmp_path / "x.gif")
    save_gif([img, img * 0.5, img * 0.1], gif, fps=5)
    g = Image.open(gif)
    assert g.is_animated and g.n_frames == 3

    # grayscale path
    save_image(img[..., :1], str(tmp_path / "gray.png"))


def test_metric_logger(tmp_path):
    import jax.numpy as jnp

    logger = MetricLogger(str(tmp_path), "run")
    logger.log(1, loss=0.5, ppl=jnp.float32(3.0))
    logger.log(2, loss=0.25)
    logger.close()
    lines = [
        json.loads(line)
        for line in open(tmp_path / "run_metrics.jsonl")
    ]
    assert lines[0]["loss"] == 0.5 and lines[0]["ppl"] == 3.0
    assert lines[1]["step"] == 2


def test_metric_logger_histogram_and_image(tmp_path):
    rng = np.random.default_rng(0)
    logger = MetricLogger(str(tmp_path), "run")
    logger.log_histogram(10, "sampler_weights", rng.normal(size=500), bins=8)
    logger.log_image(10, "reconstruction_ema", rng.uniform(0, 1, (16, 16, 3)))
    logger.close()
    lines = [
        json.loads(line) for line in open(tmp_path / "run_metrics.jsonl")
    ]
    hist = next(r for r in lines if r.get("histogram") == "sampler_weights")
    assert sum(hist["counts"]) == 500
    assert len(hist["edges"]) == len(hist["counts"]) + 1
    img = next(r for r in lines if r.get("image") == "reconstruction_ema")
    assert (tmp_path / img["path"]).is_file()
