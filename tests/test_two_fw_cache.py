"""Resume-cache metadata validation for the two-framework FVD harness.

The chunk caches (`benchmarks/fvd_two_framework.py`) are keyed by chunk
index with a meta.json sidecar guarding against silently scoring stale
rollouts (round-4 advisor finding). The total `clips` count is excluded
from the identity: chunks are seeded per index, so a shorter rescoring
run may legally reuse a longer (possibly timed-out) run's chunks.
"""

import json
import os

import pytest

from benchmarks.fvd_two_framework import _check_cache_meta


def _meta(**over):
    m = {
        "checkpoint": "/ck/step_0030000", "step": 30000, "clips": 32,
        "batch_size": 8, "num_frames": 8, "iters": 30,
        "use_ema": True, "seed": 0,
    }
    m.update(over)
    return m


def test_meta_written_on_first_use(tmp_path):
    d = str(tmp_path / "cache")
    _check_cache_meta(d, _meta())
    with open(os.path.join(d, "meta.json")) as f:
        assert json.load(f)["step"] == 30000


def test_matching_meta_resumes(tmp_path):
    d = str(tmp_path / "cache")
    _check_cache_meta(d, _meta())
    _check_cache_meta(d, _meta())  # no raise


def test_clip_count_change_is_allowed(tmp_path):
    d = str(tmp_path / "cache")
    _check_cache_meta(d, _meta(clips=32))
    _check_cache_meta(d, _meta(clips=8))  # rescore fewer clips: no raise


@pytest.mark.parametrize("field,value", [
    ("checkpoint", "/other/step_0020000"),
    ("step", 20000),
    ("iters", 10),
    ("seed", 1),
    ("use_ema", False),
    ("num_frames", 16),
    ("batch_size", 4),
])
def test_parameter_change_refuses(tmp_path, field, value):
    d = str(tmp_path / "cache")
    _check_cache_meta(d, _meta())
    with pytest.raises(SystemExit):
        _check_cache_meta(d, _meta(**{field: value}))
